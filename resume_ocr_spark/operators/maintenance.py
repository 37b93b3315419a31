"""Iceberg-style table-maintenance operators — the layout work a 10^12-row
table needs to stay scannable (BASELINE.json north_rule frames the corpus
as an Iceberg table of interleaved documents; these are the maintenance
passes that table would run, re-expressed as deterministic DataFrame ops):

* :func:`zorder_key` / :func:`zorder_layout` — multi-dimensional
  clustering: interleave the bits of several columns into one BIGINT so
  range-partitioning on it co-locates rows close in EVERY dimension; the
  per-file min/max stats then prune scans on any of the interleaved
  columns, not just the leading sort key (the `ORDER BY a, b` failure
  mode: file stats on `b` are useless). Pure integer math (scale → bit
  interleave), so a SQL oracle reproduces keys exactly.
* :func:`compaction_plan` — small-file bin-packing (the
  `rewrite_data_files` planner): deterministic first-fit by cumulative
  size within each partition, one window pass — no driver loop over the
  file list (at 10^12 rows the manifest itself is a big table).
* :func:`orphan_files` — files present in storage but unreachable from
  any retained snapshot's manifest: one anti-join. The deletion
  candidate list for snapshot expiry.

All three consume MANIFEST-level frames (file path, bytes, partition,
snapshot), never data rows — maintenance planning cost scales with file
count, not table bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_layout", "compaction_plan", "orphan_files"]


def zorder_key(
    cols: list[Column | str],
    mins: list[int],
    maxs: list[int],
    bits: int = 8,
) -> Column:
    """BIGINT Morton (Z-order) key interleaving ``bits`` bits of each
    column. Columns must be integral (cast dates/doubles upstream);
    ``mins``/``maxs`` are the per-column value bounds used to scale each
    value into [0, 2^bits) — pass table-level stats (an Iceberg table
    carries these in its metadata; here callers supply them explicitly so
    the key is a pure deterministic function, oracle-reproducible).

    Scaling is integer-exact: ``norm = ((v - min) * (2^bits - 1)) //
    (max - min)`` (clamped), then bit ``j`` of column ``c`` lands at
    interleaved position ``j * n_cols + c``. ``n_cols * bits ≤ 62`` so
    the key never touches the sign bit."""
    n = len(cols)
    if not (len(mins) == len(maxs) == n):
        raise ValueError("mins/maxs must match cols")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds 62 key bits")
    key = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for c, (col, lo, hi) in enumerate(zip(cols, mins, maxs)):
        col = F.col(col) if isinstance(col, str) else col
        span = max(int(hi) - int(lo), 1)
        if span > (1 << 45):
            # keeps (v*top - rem) exactly representable as double in the
            # one float-touching division below
            raise ValueError(f"column {c}: span {span} exceeds 2^45 — "
                             "pre-scale the column")
        v = col.cast("long") - F.lit(int(lo)).cast("long")
        v = F.greatest(F.lit(0).cast("long"),
                       F.least(F.lit(span).cast("long"), v))
        # exact integer floor-div (v*top)//span: Spark's `/` on longs
        # yields DOUBLE, so divide only after subtracting the remainder —
        # the quotient is then an exact integer in double range (≤ 2^53
        # for any span the 62-bit key budget admits)
        num = v * F.lit(top).cast("long")
        norm = ((num - num % F.lit(span)) / F.lit(span)).cast("long")
        for j in range(bits):
            bit = (norm / F.lit(1 << j).cast("long")).cast("long") % 2
            key = key + bit * F.lit(1 << (j * n + c)).cast("long")
    return key


def zorder_key_sql(
    exprs: list[str],
    mins: list[int],
    maxs: list[int],
    bits: int = 8,
) -> str:
    """The generated DuckDB twin of :func:`zorder_key` (same scaling and
    interleave arithmetic, ``//``-exact), so entry oracles cannot drift
    from the Column recipe term-by-term."""
    n = len(exprs)
    top = (1 << bits) - 1
    terms = []
    for c, (e, lo, hi) in enumerate(zip(exprs, mins, maxs)):
        span = max(int(hi) - int(lo), 1)
        norm = (f"((GREATEST(CAST(0 AS BIGINT), LEAST(CAST({span} AS "
                f"BIGINT), CAST({e} AS BIGINT) - {int(lo)})) * {top}) "
                f"// {span})")
        for j in range(bits):
            terms.append(
                f"(({norm} // {1 << j}) % 2) * {1 << (j * n + c)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    mins: list[int],
    maxs: list[int],
    bits: int = 8,
    n_files: int = 32,
    key_col: str = "zkey",
) -> DataFrame:
    """Rewrite layout: compute the z-key, range-partition on it into
    ``n_files`` output files, sort within each — the distributed
    `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`.
    One range exchange (sampled boundaries), no global sort barrier; each
    output file then covers a tight hyper-rectangle in ALL ``cols``, so
    file-level min/max stats prune scans on any of them. Caller writes
    the result with ``.write`` — this returns the laid-out frame."""
    keyed = df.withColumn(key_col, zorder_key(cols, mins, maxs, bits))
    return (keyed.repartitionByRange(n_files, key_col)
            .sortWithinPartitions(key_col))


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file",
    bytes_col: str = "bytes",
    small_factor: float = 0.75,
) -> DataFrame:
    """Bin-pack small files into rewrite groups, per partition: a file is
    "small" when ``bytes < small_factor * target_bytes``; small files are
    ordered deterministically (bytes desc, then name) and packed by
    cumulative size — group = ``floor(prev_cumsum / target_bytes)``, the
    same one-window-pass shape as ``packing.pack_sequences`` (its
    docstring proves the ≤2× occupancy bound of this greedy form). Files
    at/above the small threshold pass through with ``group = NULL`` (not
    rewritten). Planning is one window over the MANIFEST — no driver
    loop, no data-row scan.

    Output: ``(partition, file, bytes, small boolean, group bigint)``;
    every input file appears exactly once (no file lost / duplicated —
    pinned by tests)."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from pyspark.sql import Window

    small = F.col(bytes_col) < F.lit(float(small_factor) * target_bytes)
    w = (
        Window.partitionBy(partition_col, "small")
        .orderBy(F.desc(bytes_col), file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(bytes_col).over(w), F.lit(0).cast("long"))
    t = F.lit(int(target_bytes)).cast("long")
    grp = ((prev - prev % t) / t).cast("long")  # exact integer floor-div
    return (
        files.select(
            F.col(partition_col).alias(partition_col),
            F.col(file_col).alias(file_col),
            F.col(bytes_col).cast("long").alias(bytes_col),
            small.alias("small"),
        )
        .withColumn("group", F.when(F.col("small"), grp))
    )


def orphan_files(
    storage: DataFrame,
    manifests: DataFrame,
    retained_snapshots: DataFrame,
    file_col: str = "file",
    snapshot_col: str = "snapshot_id",
) -> DataFrame:
    """Files in ``storage`` not referenced by any RETAINED snapshot's
    manifest — the snapshot-expiry deletion list. ``manifests`` is
    (snapshot_id, file); ``retained_snapshots`` is the (small) snapshot
    keep-list, broadcast onto the manifest, then one left-anti join from
    storage. Distinct file paths only; never touches data bytes."""
    live = (
        manifests.join(F.broadcast(retained_snapshots), snapshot_col)
        .select(file_col).distinct()
    )
    return storage.select(file_col).distinct() \
        .join(live, file_col, "left_anti")
