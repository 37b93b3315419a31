"""Time-series operators Spark lacks natively: as-of join, interval
range join, and the hypertable continuous-aggregate rollup, built as
compositions of existing DataFrame ops (never a cartesian, never
per-row Python) — the "custom operator as a composition" tier beside
:mod:`.dedup`'s LSH family.

**As-of join** (``asof_join``): attach to every left row the single
right row with the same key whose timestamp is the LATEST at-or-before
the left timestamp — the point-in-time lookup of feature stores and
market data. Implementation is the union-window form: tag the sides,
union them, and per key let a running ``last(..., ignorenulls=True)``
over (ts, side) carry the most recent right payload forward into each
left row. ONE hash exchange on the key, zero joins, no row explosion —
the classic sort-merge-asof expressed in windows. (A join-based form
``l.ts >= r.ts`` would explode to the full history per key before
aggregating back.)

**Range join** (``range_join``): match events to (start, end] intervals
per key. Naive Spark compiles ``BETWEEN`` into BroadcastNestedLoop (or
worse); the scale form BUCKETIZES time — each event lands in exactly one
``width_sec`` bucket of exact integer microseconds, each interval
explodes to the buckets it covers — then an EQUI-join on (key, bucket)
plus the exact containment filter. Every (event, interval) pair meets in
exactly one bucket (the event's), so no dedup pass is needed. Join
strategy follows the interval side's size: broadcast for dimension-table
interval sets, shuffle equi-join otherwise — either way never a
nested-loop over the corpus.

Engine parity: all bucket arithmetic is BIGINT microseconds
(``unix_micros`` / DuckDB ``epoch_us``), and as-of tie-ordering is
right-before-left at equal timestamps (DuckDB ``ASOF JOIN``'s inclusive
``l.ts >= r.ts`` semantics). Right sides with duplicate (key, ts) rows
must be pre-deduplicated (the oracle and engine would otherwise pick
arbitrary winners); ``asof_join`` raises if asked to carry none of the
right columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str) -> str:
    """SQL fragment: exact BIGINT microseconds of a timestamp column.
    cast(... as timestamp) lets TIMESTAMP_NTZ through unix_micros —
    exact under the engine's pinned-UTC session (session.py), where
    NTZ→TZ is an identity reinterpretation."""
    return f"unix_micros(cast({col} as timestamp))"


def _floordiv_us(col: str, divisor_us: int) -> str:
    """SQL fragment: FLOOR division of a timestamp's microseconds by an
    integer width — `div` alone truncates toward zero, which disagrees
    with DuckDB's flooring `//` for pre-1970 (negative-epoch)
    timestamps, so the remainder correction makes it floor for every
    sign. Integer arithmetic throughout (double `/` + cast could
    misbucket a boundary event by one ulp)."""
    e = _us(col)
    return (f"(({e}) div {divisor_us})"
            f" - (case when (({e}) % {divisor_us}) < 0 then 1 else 0 end)")


def _reject_collisions(reserved: list[str], *frames: DataFrame) -> None:
    hit = sorted({c for f in frames for c in f.columns if c in reserved})
    if hit:
        raise ValueError(
            f"input columns collide with reserved working names: {hit}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``right`` row's
    payload columns (renamed ``<col><suffix>``) from the latest right
    timestamp <= the left timestamp within the same key, plus the matched
    timestamp ``<ts_col><suffix>``; NULLs when no predecessor exists (or
    it is older than ``tolerance_sec``). Left rows/columns are preserved
    exactly — totality like a LEFT join."""
    rcols = (list(right_cols) if right_cols is not None
             else [c for c in right.columns
                   if c not in key_cols and c != ts_col])
    if not rcols:
        raise ValueError("right side carries no payload columns")
    carried = [f"{c}{suffix}" for c in rcols] + [f"{ts_col}{suffix}"]
    left_payload = [c for c in left.columns
                    if c not in key_cols and c != ts_col]
    _reject_collisions(["_side", "_match", *carried], left)
    # the matched right row travels as ONE struct so the carry is
    # row-ATOMIC: per-column last(ignorenulls) would stitch fields from
    # DIFFERENT right rows whenever a payload value is NULL. NULL-ts
    # right rows can never be an at-or-before match (DuckDB ASOF's
    # l.ts >= NULL is never true) so they are dropped, not sorted first.
    rhs = right.filter(F.col(ts_col).isNotNull()).select(
        *key_cols, F.col(ts_col), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias("_match"),
    )
    lhs = left.select(
        *key_cols, F.col(ts_col), F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rhs.schema["_match"].dataType).alias("_match"),
    )
    # right sorts BEFORE left at equal ts → "at-or-before" is inclusive,
    # matching DuckDB ASOF's l.ts >= r.ts
    w = (Window.partitionBy(*key_cols).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = lhs.unionByName(rhs).select(
        *key_cols, ts_col, "_side", *left_payload,
        F.last("_match", ignorenulls=True).over(w).alias("_match"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        *key_cols, ts_col, *left_payload,
        *[F.col(f"_match.{c}").alias(c) for c in carried],
    )
    if tolerance_sec is not None:
        fresh = (F.expr(_us(ts_col))
                 - F.expr(_us(f"{ts_col}{suffix}"))
                 <= int(tolerance_sec) * 1_000_000)
        out = out.select(
            *key_cols, ts_col, *left_payload,
            *[F.when(fresh, F.col(c)).alias(c) for c in carried],
        )
    return out.select(*key_cols, ts_col, *left_payload, *carried)


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    width_sec: int = 3600,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Interval containment join, half-open ``start <= ts < end``:
    returns every (event, interval) match with the interval's columns
    attached. ``width_sec`` is the time-bucket granularity — size it
    near the typical interval length so intervals explode to O(1)
    buckets each. ``broadcast_intervals=False`` switches the equi-join
    to the shuffled form for interval sets too large to broadcast."""
    if width_sec <= 0:
        raise ValueError("width_sec must be positive")
    _reject_collisions(["_b"], events, intervals)
    w_us = int(width_sec) * 1_000_000
    ev = events.withColumn("_b", F.expr(_floordiv_us(ts_col, w_us)))
    iv_cols = [c for c in intervals.columns]
    # end-1 µs: the last bucket containing any in-range point of the
    # half-open interval. _floordiv_us takes a COLUMN, so shift the end
    # back one microsecond as a timestamp expression first.
    end_m1 = f"cast(timestamp_micros({_us(end_col)} - 1) as timestamp)"
    iv = (
        intervals
        .filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_b",
            F.explode(F.sequence(
                F.expr(_floordiv_us(start_col, w_us)),
                F.expr(_floordiv_us(end_m1, w_us)),
            )))
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    joined = ev.join(
        iv, [*key_cols, "_b"], "inner",
    ).filter((F.col(start_col) <= F.col(ts_col))
             & (F.col(ts_col) < F.col(end_col)))
    keep = ([c for c in events.columns]
            + [c for c in iv_cols if c not in key_cols])
    return joined.select(*keep)


def hypertable_rollup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    widths_sec: tuple[int, ...] = (60, 3600, 86400),
) -> DataFrame:
    """Hypertable continuous-aggregate rollup (the TimescaleDB shape the
    custom-operator tier names): multi-resolution time-bucket aggregates
    where each coarser level is merged FROM THE PREVIOUS LEVEL, never by
    rescanning raw — the raw table is read exactly once, and every level
    after the first aggregates a frame already ~width-ratio× smaller.

    ``widths_sec`` must be ascending and each must divide the next (the
    hypertable invariant that makes hierarchical merging exact: a coarse
    bucket is a whole number of fine buckets). Aggregates are the
    mergeable four — count / sum / min / max — over the value quantized
    to integer CENTS (``round(value·100)`` as BIGINT), so the
    hierarchical sums are exact integers with no float
    summation-order drift between levels or engines; averages are
    derivable downstream as ``sum/n``.

    Output: one row per (key, level bucket) across all levels —
    ``(*key_cols, bucket_width_sec, bucket_start, n_events, sum_cents,
    min_cents, max_cents)``. Plan: ONE exchange on (keys, fine bucket)
    for level 0; each further level is a groupBy of the
    already-aggregated (small) frame."""
    if not widths_sec:
        raise ValueError("widths_sec must be non-empty")
    if widths_sec[0] <= 0:
        raise ValueError(
            f"widths_sec must be positive (got {widths_sec[0]})")
    for a, b in zip(widths_sec, widths_sec[1:]):
        if b <= a or b % a != 0:
            raise ValueError(
                "widths_sec must be ascending and each must divide the "
                f"next (got {a} then {b}) — the invariant that makes "
                "level-to-level merging exact")
    _reject_collisions(["_b", "_cv"], events)
    w0_us = int(widths_sec[0]) * 1_000_000
    cents = F.expr(f"cast(round({value_col} * 100) as bigint)")
    lvl = (
        events
        .select(*key_cols,
                F.expr(_floordiv_us(ts_col, w0_us)).alias("_b"),
                cents.alias("_cv"))
        .groupBy(*key_cols, "_b")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("_cv").alias("sum_cents"),
             F.min("_cv").alias("min_cents"),
             F.max("_cv").alias("max_cents"))
    )
    out = None
    prev_w = widths_sec[0]
    for i, w in enumerate(widths_sec):
        if i > 0:
            factor = w // prev_w
            # same floor-not-truncate correction as _floordiv_us, for
            # pre-1970 (negative) bucket indices
            coarse = (f"(_b div {factor}) - (case when (_b % {factor}) < 0"
                      " then 1 else 0 end)")
            lvl = (lvl.withColumn("_b", F.expr(coarse))
                   .groupBy(*key_cols, "_b")
                   .agg(F.sum("n_events").alias("n_events"),
                        F.sum("sum_cents").alias("sum_cents"),
                        F.min("min_cents").alias("min_cents"),
                        F.max("max_cents").alias("max_cents")))
            prev_w = w
        level_rows = lvl.select(
            *key_cols,
            F.lit(int(w)).cast("bigint").alias("bucket_width_sec"),
            F.timestamp_micros(F.col("_b") * (int(w) * 1_000_000))
            .alias("bucket_start"),
            "n_events", "sum_cents", "min_cents", "max_cents")
        out = level_rows if out is None else out.unionByName(level_rows)
    return out
