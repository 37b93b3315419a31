"""Property pins for the Iceberg-style maintenance family
(operators/maintenance.py): the z-order layout must DEMONSTRABLY tighten
per-file min/max stats on the non-leading dimension versus a plain sort
(that's the entire point of the layout — scan pruning on every clustered
column), compaction must neither lose nor duplicate files and respect the
target bound, and orphan detection must be exactly storage minus retained
manifests."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import maintenance as mt  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return (spark.read.parquet(os.path.join(SF, "orders.parquet"))
            .select("o_orderkey", "o_custkey",
                    F.floor("o_totalprice").cast("long").alias("price"))
            .cache())


def _file_spans(df, key_order_col, stat_col, n_files=16):
    """Simulate the file layout: range-partition by key, then measure each
    file's (min, max) span of ``stat_col`` — the stats a reader would
    prune on. Returns the mean span fraction of the full range."""
    laid = (df.repartitionByRange(n_files, key_order_col)
            .withColumn("_pid", F.spark_partition_id()))
    spans = (laid.groupBy("_pid")
             .agg(F.min(stat_col).alias("lo"), F.max(stat_col).alias("hi"))
             .collect())
    full = df.agg(F.min(stat_col), F.max(stat_col)).collect()[0]
    width = full[1] - full[0]
    return sum((r["hi"] - r["lo"]) / width for r in spans) / len(spans)


def test_zorder_tightens_stats_on_both_dims(spark, orders):
    keyed = orders.withColumn(
        "zkey", mt.zorder_key(["o_custkey", "price"],
                              [0, 1013], [1499, 499979], bits=8))
    # plain sort by custkey: price stats per file are useless (~full range)
    plain_price = _file_spans(keyed, "o_custkey", "price")
    z_price = _file_spans(keyed, "zkey", "price")
    z_cust = _file_spans(keyed, "zkey", "o_custkey")
    assert plain_price > 0.9, f"fixture sanity: {plain_price}"
    assert z_price < 0.6 * plain_price, (z_price, plain_price)
    assert z_cust < 0.6, z_cust  # still prunes the other dim too


def test_zorder_key_bounds_and_monotonicity(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)],
        "a long, b long")
    out = df.withColumn(
        "z", mt.zorder_key(["a", "b"], [0, 0], [255, 255], bits=8))
    rows = out.collect()
    assert all(0 <= r["z"] < (1 << 16) for r in rows)
    # exact Morton interleave at identity scaling: z == interleave(a, b)
    def morton(a, b):
        z = 0
        for j in range(8):
            z |= ((a >> j) & 1) << (2 * j) | ((b >> j) & 1) << (2 * j + 1)
        return z
    assert all(r["z"] == morton(r["a"], r["b"]) for r in rows)
    # clamping: out-of-bounds values pin to the edge cells
    edge = spark.createDataFrame([(-5, 300)], "a long, b long").withColumn(
        "z", mt.zorder_key(["a", "b"], [0, 0], [255, 255], bits=8))
    assert edge.collect()[0]["z"] == morton(0, 255)


def test_zorder_rejects_bad_geometry(spark):
    with pytest.raises(ValueError):
        mt.zorder_key(["a", "b"], [0], [1, 2])
    with pytest.raises(ValueError):
        mt.zorder_key(["a", "b", "c"], [0, 0, 0], [1, 1, 1], bits=21)
    with pytest.raises(ValueError):
        mt.zorder_key(["a"], [0], [1 << 50])


def test_compaction_invariants(spark, orders):
    target = 1 << 20
    files = orders.filter("o_orderkey < 500").select(
        (F.col("o_custkey") % 3).cast("string").alias("partition"),
        F.concat(F.lit("f"), F.col("o_orderkey").cast("string"))
            .alias("file"),
        (1 + (F.col("o_orderkey") * 37) % (target // 2)).alias("bytes"))
    plan = mt.compaction_plan(files, target_bytes=target).cache()
    # every file exactly once
    assert plan.count() == files.count()
    assert plan.select("file").distinct().count() == files.count()
    # all inputs here are small (< 0.75*target) → every group planned
    assert plan.filter("group IS NULL").count() == 0
    # group occupancy ≤ 2× target (greedy cumsum bound, matches
    # packing.pack_sequences' documented bound) and groups within a
    # partition are dense from 0
    sizes = (plan.groupBy("partition", "group")
             .agg(F.sum("bytes").alias("b"),
                  F.count("*").alias("nf")).collect())
    assert all(r["b"] < 2 * target for r in sizes)
    for p in {r["partition"] for r in sizes}:
        gs = sorted(r["group"] for r in sizes if r["partition"] == p)
        assert gs == list(range(len(gs)))
    # large files pass through unplanned
    big = files.withColumn("bytes", F.col("bytes") + target)
    plan_big = mt.compaction_plan(big, target_bytes=target)
    assert plan_big.filter("group IS NOT NULL").count() == 0
    with pytest.raises(ValueError):
        mt.compaction_plan(files, target_bytes=0)


def test_orphan_files_exactness(spark):
    manifests = spark.createDataFrame(
        [(s, f"f{i}") for s in range(3) for i in range(s * 10, s * 10 + 20)],
        "snapshot_id long, file string")
    storage = spark.createDataFrame(
        [(f"f{i}",) for i in range(50)], "file string")
    retained = spark.createDataFrame([(1,), (2,)], "snapshot_id long")
    got = sorted(r["file"] for r in
                 mt.orphan_files(storage, manifests, retained).collect())
    live = {f"f{i}" for s in (1, 2) for i in range(s * 10, s * 10 + 20)}
    want = sorted({f"f{i}" for i in range(50)} - live)
    assert got == want
