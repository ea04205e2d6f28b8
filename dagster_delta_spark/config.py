"""Configuration models for the PySpark-native Delta-like engine.

Re-expresses the reference's config surface (dagster-delta
``config.py:7-216``, ``io_manager.py:40-70``) as plain dataclasses /
enums with a translation to Spark/Hadoop session configuration.

Everything here is driver-side metadata; no data movement.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional


class WriteMode(str, enum.Enum):
    """Write-mode semantics (reference: dd/dagster_delta/io_manager.py:48-56).

    - ``error``: fail if the table already exists (W1)
    - ``append``: append rows (W2)
    - ``overwrite``: replace the table, or only the matching partitions
      when partition dimensions are present (W3/O1)
    - ``ignore``: no-op if the table exists (W4)
    - ``create_or_replace``: recreate table *metadata + schema only*,
      writing no data (W5; reference handler.py:226-235)
    - ``merge``: MERGE INTO with auto-create of a missing target (W6)
    """

    error = "error"
    append = "append"
    overwrite = "overwrite"
    ignore = "ignore"
    create_or_replace = "create_or_replace"
    merge = "merge"


class SchemaMode(str, enum.Enum):
    """Schema-evolution policy (reference: dd/dagster_delta/io_manager.py:59-63).

    ``append``  -> Spark ``mergeSchema``  (add new columns, keep old)
    ``overwrite`` -> Spark ``overwriteSchema`` (replace the schema)
    """

    append = "append"
    overwrite = "overwrite"


class MergeType(str, enum.Enum):
    """MERGE strategies (reference: dd/dagster_delta/config.py:190-216,
    handler.py:111-118)."""

    update_only = "update_only"  # M1: when_matched_update_all
    deduplicate_insert = "deduplicate_insert"  # M2: when_not_matched_insert_all
    upsert = "upsert"  # M3: both
    # M4: update + delete; string value matches the reference enum so
    # metadata ported from it round-trips through MergeType(value)
    replace_delete_unmatched = "replace_and_delete_unmatched"

    @classmethod
    def _missing_(cls, value: object) -> Optional["MergeType"]:
        # accept the shorthand used by earlier versions of this repo
        if value == "replace_delete_unmatched":
            return cls.replace_delete_unmatched
        return None


@dataclass(frozen=True)
class MergeConfig:
    """Merge configuration (reference: dd/dagster_delta/config.py:190-216).

    ``predicate`` is an equi/theta condition over aliased source/target
    columns, e.g. ``"s.a = t.a"``. ``error_on_type_mismatch`` mirrors
    the reference default (config.py:214-215).
    """

    merge_type: MergeType = MergeType.upsert
    predicate: Optional[str] = None
    source_alias: str = "s"
    target_alias: str = "t"
    error_on_type_mismatch: bool = True


# ---------------------------------------------------------------------------
# Storage configuration -> Spark/Hadoop conf translation (reference O7:
# dd/dagster_delta/config.py:7-187, io_manager.py:158-161, 256-273).
#
# The reference flattens discriminated-union configs to a str:str dict of
# object-store options for delta-rs.  On Spark the same knobs become
# Hadoop filesystem configuration keys on the session.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LocalConfig:
    """Local filesystem storage (reference config.py: LocalConfig)."""

    def spark_confs(self) -> dict[str, str]:
        return {}


@dataclass(frozen=True)
class S3Config:
    """S3/MinIO storage options (reference config.py: S3Config).

    Maps delta-rs object-store keys to ``fs.s3a.*`` Hadoop confs.
    """

    access_key_id: Optional[str] = None
    secret_access_key: Optional[str] = None
    session_token: Optional[str] = None
    endpoint: Optional[str] = None
    region: Optional[str] = None
    #: accepted for reference-config parity only: delta-rs needs it for
    #: stores without atomic rename, but this engine publishes commits
    #: via its own staged-write + atomic log protocol (tablelog.py), so
    #: no Spark conf corresponds and the flag is intentionally a no-op
    allow_unsafe_rename: bool = False

    def spark_confs(self) -> dict[str, str]:
        out: dict[str, str] = {}
        if self.access_key_id is not None:
            out["spark.hadoop.fs.s3a.access.key"] = self.access_key_id
        if self.secret_access_key is not None:
            out["spark.hadoop.fs.s3a.secret.key"] = self.secret_access_key
        if self.session_token is not None:
            out["spark.hadoop.fs.s3a.session.token"] = self.session_token
        if self.endpoint is not None:
            out["spark.hadoop.fs.s3a.endpoint"] = self.endpoint
        if self.region is not None:
            out["spark.hadoop.fs.s3a.endpoint.region"] = self.region
        return out


@dataclass(frozen=True)
class AzureConfig:
    """Azure ADLS/Blob storage options (reference config.py: AzureConfig)."""

    account_name: Optional[str] = None
    account_key: Optional[str] = None
    sas_token: Optional[str] = None
    client_id: Optional[str] = None
    client_secret: Optional[str] = None
    tenant_id: Optional[str] = None

    def spark_confs(self) -> dict[str, str]:
        out: dict[str, str] = {}
        has_auth = any(v is not None for v in (
            self.account_key, self.sas_token, self.client_id))
        if has_auth and not self.account_name:
            # the account name is part of every conf KEY — without it
            # the keys render as fs.azure.account.key..dfs.core... for
            # the empty account, which ABFS never matches, and auth
            # fails at runtime with no hint of the cause
            raise ValueError(
                "AzureConfig requires account_name when any credential "
                "is set (it is embedded in every Hadoop conf key)"
            )
        oauth = bool(self.client_id and self.client_secret and self.tenant_id)
        if self.sas_token is not None and oauth:
            raise ValueError(
                "AzureConfig: sas_token and client credentials are "
                "mutually exclusive (both set auth.type — the second "
                "would silently disable the first)"
            )
        acct = self.account_name or ""
        suffix = f"{acct}.dfs.core.windows.net"
        if self.account_key is not None:
            out[f"spark.hadoop.fs.azure.account.key.{suffix}"] = self.account_key
        if self.sas_token is not None:
            # auth.type=SAS is required for ABFS to activate the token
            # provider at all — without it the other two keys are inert
            out[f"spark.hadoop.fs.azure.account.auth.type.{suffix}"] = "SAS"
            out[f"spark.hadoop.fs.azure.sas.token.provider.type.{suffix}"] = (
                "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider"
            )
            out[f"spark.hadoop.fs.azure.sas.fixed.token.{suffix}"] = self.sas_token
        if oauth:
            out[f"spark.hadoop.fs.azure.account.auth.type.{suffix}"] = "OAuth"
            out[f"spark.hadoop.fs.azure.account.oauth.provider.type.{suffix}"] = (
                "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
            )
            out[f"spark.hadoop.fs.azure.account.oauth2.client.id.{suffix}"] = self.client_id
            out[f"spark.hadoop.fs.azure.account.oauth2.client.secret.{suffix}"] = (
                self.client_secret
            )
            out[f"spark.hadoop.fs.azure.account.oauth2.client.endpoint.{suffix}"] = (
                f"https://login.microsoftonline.com/{self.tenant_id}/oauth2/token"
            )
        return out


@dataclass(frozen=True)
class GcsConfig:
    """GCS storage options (reference config.py: GcsConfig)."""

    service_account_path: Optional[str] = None

    def spark_confs(self) -> dict[str, str]:
        out: dict[str, str] = {}
        if self.service_account_path is not None:
            out["spark.hadoop.google.cloud.auth.service.account.enable"] = "true"
            out["spark.hadoop.google.cloud.auth.service.account.json.keyfile"] = (
                self.service_account_path
            )
        return out


@dataclass(frozen=True)
class ClientConfig:
    """HTTP client options (reference config.py: ClientConfig).

    On Spark these are connection-level Hadoop confs.
    """

    #: seconds (the reference's duration semantics); converted to the
    #: milliseconds Hadoop expects — writing the raw value made a
    #: 30-second timeout a 30-MILLISECOND one
    timeout: Optional[int] = None
    max_retries: Optional[int] = None

    def spark_confs(self) -> dict[str, str]:
        out: dict[str, str] = {}
        if self.timeout is not None:
            out["spark.hadoop.fs.s3a.connection.timeout"] = str(
                self.timeout * 1000)
        if self.max_retries is not None:
            out["spark.hadoop.fs.s3a.retry.limit"] = str(self.max_retries)
        return out


StorageConfig = object  # union: LocalConfig | S3Config | AzureConfig | GcsConfig


def flatten_storage_confs(
    storage: Optional[object] = None, client: Optional[ClientConfig] = None
) -> dict[str, str]:
    """Flatten storage + client options into Spark conf keys, dropping
    ``None`` values (mirrors reference io_manager.py:158-161 flattening)."""

    out: dict[str, str] = {}
    if storage is not None and hasattr(storage, "spark_confs"):
        out.update(storage.spark_confs())
    if client is not None:
        out.update(client.spark_confs())
    return out


@dataclass(frozen=True)
class TableConnection:
    """Resolved physical address + auth + table properties
    (reference: dd/dagster_delta/io_manager.py:34-38)."""

    table_uri: str
    storage_confs: dict[str, str] = field(default_factory=dict)
    table_config: Optional[dict[str, str]] = None
