"""Alternative document sources/sinks for the documents_raw shape.

The warehouse shim (warehouse.py) is the primary bucketed-parquet source;
these readers bring the same `(doc_id, spans[])` shape in from the interchange
formats a 100 TB ingest actually meets — JSONL dumps and CSV manifests —
using Spark's native readers (distributed, schema-explicit, no Python in the
scan path). Reference source inventory: SURVEY.md §2.1 S1-S3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
]))

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
])


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines source: one document object per line, explicit schema
    (no sampling-based inference pass — a second full read at 100 TB)."""
    return spark.read.schema(DOCS_SCHEMA).json(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV manifest source: `doc_id,spans_json` rows; the spans payload is a
    JSON string column decoded with from_json (JVM-side, no Python)."""
    raw = spark.read.schema(
        "doc_id string, spans_json string").option("header", True).csv(path)
    return raw.select(
        "doc_id", F.from_json("spans_json", SPAN_TYPE).alias("spans"))


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink (line-per-document interchange dump)."""
    df.write.mode("overwrite").json(path)
