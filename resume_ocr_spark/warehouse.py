"""Iceberg-layout warehouse shim.

No Iceberg jars ship in this sandbox (no network), so tables are laid out the
way an Iceberg ``bucket(B, doc_id)`` partition spec would place them:

    <root>/<table>/data/bucket=<murmur3(doc_id) % B>/part-*.parquet
    <root>/<table>/manifest.json     (schema, bucket count, row counts)

Reads/writes use plain ``spark.read.parquet`` with partition discovery, so
partition pruning on ``bucket`` works exactly like Iceberg's; swapping in a
real catalog on a cluster is a config change (``df.writeTo("db.t")``), not a
code change.  The bucket function is Spark's ``hash()`` (Murmur3) — computed
by the JVM, so bucketing is consistent for any reader.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import WAREHOUSE_BUCKETS

SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
BLOBS_SCHEMA = "media_ref string, kind string, payload binary"


def bucket_col(key: str = "doc_id", buckets: int = WAREHOUSE_BUCKETS):
    return F.pmod(F.hash(F.col(key)), F.lit(buckets)).cast("int")


def write_table(
    df: DataFrame,
    root: str,
    table: str,
    bucket_key: str | None = "doc_id",
    buckets: int = WAREHOUSE_BUCKETS,
    mode: str = "overwrite",
) -> str:
    path = os.path.join(root, table, "data")
    writer = df
    if bucket_key is not None:
        writer = df.withColumn("bucket", bucket_col(bucket_key, buckets))
        writer.write.mode(mode).partitionBy("bucket").parquet(path)
    else:
        writer.write.mode(mode).parquet(path)
    manifest = {
        "table": table,
        "layout": "iceberg-shim-v1",
        "bucket_key": bucket_key,
        "buckets": buckets if bucket_key else 0,
        "schema": df.schema.jsonValue(),
        "written_at": time.time(),
    }
    with open(os.path.join(root, table, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return path


def read_table(
    spark: SparkSession, root: str, table: str, buckets: list[int] | None = None
) -> DataFrame:
    """Read a table; ``buckets`` restricts to specific bucket partitions
    (partition pruning — only those directories are scanned)."""
    base = os.path.join(root, table, "data")
    df = spark.read.option("basePath", base).parquet(base)
    if buckets is not None:
        df = df.filter(F.col("bucket").isin([int(b) for b in buckets]))
    return df


def manifest(root: str, table: str) -> dict:
    with open(os.path.join(root, table, "manifest.json")) as fh:
        return json.load(fh)


def build_warehouse(
    spark: SparkSession,
    root: str,
    docs: list[dict],
    blobs: list[dict],
    buckets: int = WAREHOUSE_BUCKETS,
) -> None:
    """Materialize a synthetic corpus as the two input tables."""
    docs_df = spark.createDataFrame(
        [(d["doc_id"], [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in d["spans"]
        ]) for d in docs],
        schema=SPANS_SCHEMA,
    )
    blobs_df = spark.createDataFrame(
        [(b["media_ref"], b["kind"], bytearray(b["payload"])) for b in blobs],
        schema=BLOBS_SCHEMA,
    )
    write_table(docs_df, root, "documents_raw", bucket_key="doc_id", buckets=buckets)
    # blobs bucketed by media_ref so a cluster-side sort-merge join can
    # co-locate; small dictionaries get broadcast anyway
    write_table(blobs_df, root, "media_blobs", bucket_key="media_ref", buckets=buckets)
