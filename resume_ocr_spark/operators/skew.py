"""Explicit skew handling for hot keys (north_rule: "salts skewed
partitions").

Two complementary defenses exist in this engine:

  1. *Structural*: the extraction pipeline never aggregates by a hot key
     until after per-span work is done — `repartition(doc_id, offset)`
     spreads a 10^3-media-span document across the whole stage
     (operators/extract.py), so OCR cost can't pin one task.
  2. *Salted aggregation* (this module): when a groupBy key IS skewed
     (one user with millions of events, one fingerprint shared by millions
     of near-empty docs), a two-stage salted aggregate bounds the rows any
     single reduce task sees: stage 1 groups by (key, salt) — hot keys
     split into `salt_buckets` partial groups with map-side combine —
     stage 2 merges the partials by key. Same result as a direct groupBy
     (checked against the DuckDB oracle), shuffle skew bounded by
     1/salt_buckets.

AQE's skew-join splitting (enabled in session.py) covers *join* skew at
runtime; salting covers *aggregation* skew, which AQE does not re-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS,
              deterministic_from: str | None = None) -> DataFrame:
    """Adds a ``salt`` column in [0, salt_buckets), always deterministic in
    the row's *values*: hash of the given source column, else hash of all
    columns. F.rand() is deliberately NOT used — rand is only deterministic
    per (partition, row-order), so under executor loss with a shuffled
    upstream a recomputed stage-1 partial can re-salt rows differently from
    the lost attempt (SPARK-23207 class) and silently double-count or drop
    them in the merge. Value-hash salting recomputes identically on retry.

    Caveat: if one hot key's rows are also byte-identical across ALL columns,
    value-hashing puts them in one salt bucket and the salt spreads nothing —
    pass ``deterministic_from`` naming any distinguishing column, or
    pre-assign an explicit row id upstream."""
    if deterministic_from is not None:
        salt = F.pmod(F.hash(F.col(deterministic_from)), F.lit(salt_buckets))
    else:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                      F.lit(salt_buckets))
    return df.withColumn("salt", salt)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output column name → stage-1 aggregate Column (count/sum/
    min/max — anything where merge(partials) = agg(all)). The merge is
    chosen by the name prefix and is STRICT: ``count_``/``sum_`` → SUM of
    partials, ``min_`` → MIN, ``max_`` → MAX; any other prefix raises —
    non-algebraic aggregates (avg, countDistinct, …) would silently merge
    to wrong values, so they are rejected up front."""
    _MERGES = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    merges = []
    for name in aggs:
        prefix = name.split("_", 1)[0]
        if prefix not in _MERGES:
            raise ValueError(
                f"salted_agg: column {name!r} must be prefixed with one of "
                f"{sorted(_MERGES)}_ so the partial-merge is well-defined "
                "(avg/countDistinct are not salt-mergeable — compute avg "
                "from sum_+count_, use approx_count_distinct partials, or "
                "aggregate unsalted)")
        merges.append(_MERGES[prefix](name).alias(name))
    stage1 = (
        with_salt(df, salt_buckets, deterministic_from=salt_from)
        .groupBy(key, "salt")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    return stage1.groupBy(key).agg(*merges)
