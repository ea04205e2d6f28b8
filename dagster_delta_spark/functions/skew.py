"""Skew-mitigation join utility.

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``); ``salted_join`` is the
explicit fallback for *known* heavy-hitter keys where even a split
shuffle partition overwhelms a task: the skewed (large) side gets a
random salt in ``[0, salt)``, the small side is replicated ``salt``
times, and the join key becomes (key, salt) — spreading each hot key
over ``salt`` tasks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
    small_columns: Sequence[str] = (),
) -> DataFrame:
    """Join ``large`` with ``small`` on column ``on`` with an explicit
    ``salt``-way spread of every key.

    ``large`` gains a deterministic pseudo-random salt derived from a
    full-row hash (``xxhash64`` of all columns — avoids RAND()'s
    nondeterminism under task retries, which can duplicate or drop
    rows); ``small`` is exploded ``salt`` times.  Use only when a few
    known keys dominate; the replication multiplies the small side's
    shuffle volume by ``salt``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salted = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt)),
    )
    s_cols = list(small_columns) or [c for c in small.columns]
    s_rep = small.select(
        *s_cols, F.explode(F.array(*[F.lit(i) for i in range(salt)])).alias("__salt")
    )
    joined = l_salted.join(
        s_rep,
        [on, "__salt"],
        how,
    )
    return joined.drop("__salt")
