"""Identity columns (table.py, ``dds.identityColumns`` — Delta's
GENERATED ALWAYS AS IDENTITY, strengthened to DENSE allocation).

Contract: writes omit the column; the table assigns
``next, next+step, ...`` with the high-water mark advancing in the
SAME commit as the data; providing the column raises; a concurrent
writer that advanced the mark mid-write fails loudly instead of
minting duplicates.
"""

import json

import pytest

from dagster_delta_spark import DeltaSparkTable, WriteMode
from dagster_delta_spark.tablelog import ConcurrentAppendError

IDCFG = {"dds.identityColumns": json.dumps({"rid": {}})}


def _df(spark, n, base=0):
    return spark.createDataFrame(
        [(base + i, f"v{base + i}") for i in range(n)],
        "k long, s string")


def test_dense_allocation_across_appends(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 7), WriteMode.error, table_configuration=IDCFG)
    t.write(_df(spark, 5, base=7), WriteMode.append)
    rows = t.read().collect()
    assert sorted(r["rid"] for r in rows) == list(range(1, 13))
    # ids are per-row stable: distinct business keys got distinct ids
    assert len({(r["k"], r["rid"]) for r in rows}) == 12


def test_start_and_step(spark, tmp_path):
    cfg = {"dds.identityColumns": json.dumps(
        {"rid": {"start": 100, "step": 10}})}
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=cfg)
    t.write(_df(spark, 2, base=3), WriteMode.append)
    assert sorted(r["rid"] for r in t.read().collect()) == [
        100, 110, 120, 130, 140]


def test_providing_the_column_raises(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.write(t.read(), WriteMode.append)


def test_overwrite_keeps_the_mark_monotonic(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 6), WriteMode.error, table_configuration=IDCFG)
    t.write(_df(spark, 4), WriteMode.overwrite)
    # replaced rows get FRESH ids past the old mark — never reused
    assert sorted(r["rid"] for r in t.read().collect()) == [7, 8, 9, 10]


def test_concurrent_mark_advance_refuses(spark, tmp_path, monkeypatch):
    """A writer that raced the allocation must fail, not duplicate:
    sneak a real append between this write's allocation and its
    commit by advancing the mark from inside _assign_identity."""
    import dagster_delta_spark.table as tmod

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)

    real = tmod._assign_identity
    state = {"armed": True}

    def sneaky(df, col, spec, cfg):
        out = real(df, col, spec, cfg)
        if state["armed"]:
            state["armed"] = False  # the sneaky append allocates sanely
            DeltaSparkTable(spark, str(tmp_path / "t")).write(
                _df(spark, 2, base=90), WriteMode.append)
        return out

    monkeypatch.setattr(tmod, "_assign_identity", sneaky)
    with pytest.raises(ConcurrentAppendError, match="identity mark"):
        t.write(_df(spark, 2, base=50), WriteMode.append)
    # no duplicate ids ever became visible
    ids = [r["rid"] for r in t.read().collect()]
    assert sorted(ids) == list(range(1, 6))


def test_idempotent_append_assigns_and_replay_noops(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 4), WriteMode.error, table_configuration=IDCFG)
    t.idempotent_append(_df(spark, 3, base=4), "app", 0)
    got = sorted(r["rid"] for r in t.read().collect())
    assert got == list(range(1, 8))
    res = t.idempotent_append(_df(spark, 3, base=4), "app", 0)  # replay
    assert res["skipped"]
    assert sorted(r["rid"] for r in t.read().collect()) == got
    t.idempotent_append(_df(spark, 2, base=7), "app", 1)
    assert sorted(r["rid"] for r in t.read().collect()) == list(range(1, 10))


def test_identity_column_refuses_rename_drop(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)
    with pytest.raises(ValueError, match="identity"):
        t.rename_column("rid", "rid2")
    with pytest.raises(ValueError, match="identity"):
        t.drop_column("rid")


def test_identity_survives_dml_and_time_travel(spark, tmp_path):
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 8), WriteMode.error, table_configuration=IDCFG)
    t.delete("rid <= 2", use_dv=True)
    t.write(_df(spark, 2, base=8), WriteMode.append)
    assert sorted(r["rid"] for r in t.read().collect()) == [
        3, 4, 5, 6, 7, 8, 9, 10]
    assert sorted(r["rid"] for r in t.read(version=0).collect()) == list(
        range(1, 9))


def test_restore_never_regresses_the_mark(spark, tmp_path):
    """Ids allocated after the restore target live on in HISTORY;
    restoring must carry the high-water mark forward, never re-mint."""
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)  # v0
    t.write(_df(spark, 4, base=3), WriteMode.append)                    # v1
    t.restore(0)                                                        # v2
    assert sorted(r["rid"] for r in t.read().collect()) == [1, 2, 3]
    t.write(_df(spark, 2, base=7), WriteMode.append)                    # v3
    # fresh ids continue past the HISTORICAL allocation, not past v0's
    assert sorted(r["rid"] for r in t.read().collect()) == [1, 2, 3, 8, 9]
    # history still reads its own ids
    assert sorted(r["rid"] for r in t.read(version=1).collect()) == list(
        range(1, 8))


def test_merge_source_identity_and_update_refuse(spark, tmp_path):
    """A MERGE source providing a GENERATED ALWAYS identity column
    refuses (same contract as write), and UPDATE cannot assign the
    column — both with pointed errors."""
    from pyspark.sql import functions as F

    from dagster_delta_spark import MergeConfig, MergeType

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.merge(_df(spark, 2, base=3).withColumn("rid", F.lit(99)),
                MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    with pytest.raises(ValueError, match="IDENTITY"):
        t.update({"rid": "rid + 100"}, "k = 1")
    t.update({"s": "'patched'"}, "k = 1")  # non-identity columns fine
    assert t.read().where("s = 'patched'").count() == 1


def test_merge_upsert_allocates_identity_for_inserts(spark, tmp_path):
    """Merge-upsert into an identity table: matched rows KEEP their
    ids, not-matched inserts allocate dense ids continuing from the
    high-water mark — in the same commit as the data."""
    from dagster_delta_spark import MergeConfig, MergeType

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)
    before = {r["k"]: r["rid"] for r in t.read().collect()}
    assert sorted(before.values()) == [1, 2, 3]
    # k=2 matches (update), k=3/4 insert
    t.merge(_df(spark, 3, base=2),
            MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    after = {r["k"]: r["rid"] for r in t.read().collect()}
    assert after[2] == before[2]                  # matched keeps id
    assert sorted(after.values()) == [1, 2, 3, 4, 5]   # dense
    assert {after[3], after[4]} == {4, 5}         # inserts allocated
    # mark advanced in the same commit: a further append continues
    t.write(_df(spark, 1, base=9), WriteMode.append)
    assert sorted(r["rid"] for r in t.read().collect()) == [1, 2, 3, 4, 5, 6]


def test_merge_identity_concurrent_mark_advance_raises(spark, tmp_path, monkeypatch):
    """A writer that advances the identity mark between merge planning
    and commit invalidates the allocation — the merge must raise, not
    mint duplicate ids."""
    import dagster_delta_spark.table as tmod
    from dagster_delta_spark import MergeConfig, MergeType

    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, 3), WriteMode.error, table_configuration=IDCFG)

    real = tmod._assign_identity
    state = {"armed": True}

    def sneaky(df, col, spec, configuration):
        out = real(df, col, spec, configuration)
        if state["armed"]:
            state["armed"] = False  # the racing append allocates sanely
            DeltaSparkTable(spark, str(tmp_path / "t")).write(
                _df(spark, 2, base=50), WriteMode.append)
        return out

    monkeypatch.setattr(tmod, "_assign_identity", sneaky)
    with pytest.raises(ConcurrentAppendError, match="identity mark"):
        t.merge(_df(spark, 2, base=10),
                MergeConfig(MergeType.upsert, predicate="s.k = t.k"))
    # no duplicate ids ever became visible
    ids = [r["rid"] for r in t.read().collect()]
    assert sorted(ids) == list(range(1, 6))


def test_identity_merge_fuzz_dense_and_stable(spark, tmp_path):
    """Randomized interleaving of appends and merge-upserts /
    dedup-inserts on an identity table.  Invariants after EVERY step:
    the rid set is exactly the dense 1..N, every pre-existing key
    keeps its rid (updates never reassign), and values match a plain
    dict model."""
    import random

    from dagster_delta_spark import MergeConfig, MergeType

    rnd = random.Random(77)
    t = DeltaSparkTable(spark, str(tmp_path / "t"))
    keyspace = list(range(200))
    rnd.shuffle(keyspace)
    fresh = iter(keyspace)

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, s string")

    vals = {}
    first = [(next(fresh), "v0") for _ in range(4)]
    t.write(df_of(first), WriteMode.error, table_configuration=IDCFG)
    vals.update(dict(first))
    rids = {r["k"]: r["rid"] for r in t.read().collect()}

    for step in range(10):
        op = rnd.choice(["append", "upsert", "dedup_insert"])
        if op == "append":
            rows = [(next(fresh), f"a{step}") for _ in range(rnd.randint(1, 3))]
            t.write(df_of(rows), WriteMode.append)
            vals.update(dict(rows))
        else:
            matched = rnd.sample(sorted(vals), rnd.randint(0, min(3, len(vals))))
            new = [next(fresh) for _ in range(rnd.randint(0, 3))]
            rows = [(k, f"m{step}") for k in matched + new]
            if not rows:
                continue
            t.merge(df_of(rows), MergeConfig(
                MergeType.upsert if op == "upsert"
                else MergeType.deduplicate_insert,
                predicate="s.k = t.k"))
            if op == "upsert":
                vals.update(dict(rows))
            else:  # dedup_insert: matched targets untouched
                vals.update({k: v for k, v in rows if k not in vals})
        got = {r["k"]: (r["rid"], r["s"]) for r in t.read().collect()}
        assert {k: v for k, (_, v) in got.items()} == vals, (step, op)
        all_rids = sorted(r for r, _ in got.values())
        assert all_rids == list(range(1, len(vals) + 1)), (step, op)
        for k, rid in rids.items():
            assert got[k][0] == rid, (step, op, k)
        rids = {k: r for k, (r, _) in got.items()}
