"""Semi-structured (JSON) ingestion — the metadata-sidecar stage of a
crawl pipeline: WARC/WET records, page metadata, API event streams and
annotation sidecars all arrive as JSON strings riding beside the text.
These operators turn them into relational columns WITHOUT a Python row
loop: everything is `from_json` / `get_json_object` — JVM-side,
whole-stage-codegen'd, zero-shuffle projections until an aggregation is
asked for.

Reference parity: the reference app stores per-document metadata as
Mongo documents and re-parses them per request (`app/services/
query_service.py`); here the parse is a columnar projection the
optimizer can prune and push down.

100 TB shape: every operator below is a per-row projection (explodes
multiply rows but never exchange); schema inference alone is
driver-bounded by an explicit sample cap (the same bounded-collect
discipline as ``similarity._driver_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema-inference sample bound (driver-side rows)
INFER_SAMPLE = 1000


def json_scalars(
    df: DataFrame,
    col: str,
    fields: dict[str, tuple[str, str]],
) -> DataFrame:
    """Typed scalar extraction: ``fields`` maps output column name →
    (JSONPath, spark type). One zero-shuffle projection; missing paths
    yield NULL (never an error row — sidecar metadata is best-effort)."""
    cols = [F.get_json_object(F.col(col), path).cast(t).alias(name)
            for name, (path, t) in fields.items()]
    return df.select("*", *cols)


def json_array_unnest(
    df: DataFrame,
    col: str,
    path: str,
    id_cols: list[str],
    element_type: str = "string",
    out_col: str = "element",
) -> DataFrame:
    """Unnest a JSON array at ``path`` to one row per element with its
    0-based index: (ids…, idx, element). Rows whose path is missing or
    not an array produce no output rows."""
    arr = F.from_json(F.get_json_object(F.col(col), path),
                      f"array<{element_type}>")
    return (
        df.select(*id_cols, F.posexplode(arr).alias("idx", out_col))
    )


def json_flatten(
    df: DataFrame,
    col: str,
    id_cols: list[str],
    max_depth: int = 2,
) -> DataFrame:
    """Generic leaf flattening: (ids…, path, kind, value) rows for every
    node reachable in ≤ ``max_depth`` object levels — the
    schema-agnostic triage pass run before deciding a sidecar's real
    schema. ``kind`` ∈ object/array/scalar; objects recurse until the
    depth budget, at which point they emit as-is.

    Mechanics: `from_json(…, map<string,string>)` parses ANY object one
    level deep — nested objects/arrays arrive as their compact JSON
    re-serialization — so each level is one parse + one explode, no
    Python. Known heuristic (documented, inherent to the string-typed
    map): a SCALAR STRING whose text itself starts with '{' or '['
    classifies as object/array; sidecars with such payloads should use
    :func:`json_scalars` with explicit paths instead."""
    lvl = df.select(*id_cols, F.lit("$").alias("path"),
                    F.col(col).alias("_js"))
    outs = []
    for depth in range(max_depth):
        kv = lvl.select(
            *id_cols, "path",
            F.explode(F.from_json("_js", "map<string,string>"))
            .alias("_k", "_v"))
        kv = kv.select(
            *id_cols,
            F.concat(F.col("path"), F.lit("."), F.col("_k")).alias("path"),
            F.col("_v"))
        # NULL-safe: a JSON null value parses to a NULL map value, which
        # must flatten as a scalar leaf — a bare ~startswith filter would
        # evaluate NULL and silently DROP null-valued keys at every
        # depth except the last (review finding)
        is_obj = F.col("_v").isNotNull() & F.col("_v").startswith("{")
        is_arr = F.col("_v").isNotNull() & F.col("_v").startswith("[")
        last = depth == max_depth - 1
        keep = kv if last else kv.filter(~is_obj)
        outs.append(keep.select(
            *id_cols, "path",
            F.when(is_obj, "object").when(is_arr, "array")
            .otherwise("scalar").alias("kind"),
            F.col("_v").alias("value")))
        if last:
            break
        lvl = kv.filter(is_obj).select(
            *id_cols, "path", F.col("_v").alias("_js"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def infer_json_schema(df: DataFrame, col: str,
                      sample: int = INFER_SAMPLE):
    """Driver-bounded schema inference: read ≤ ``sample`` JSON strings
    through spark.read.json and return the merged StructType — the
    explicit-schema handoff for :func:`with_parsed` (never infer on the
    full corpus: inference is a whole extra scan and a schema that
    drifts per partition)."""
    spark = df.sparkSession
    rows = [r[0] for r in
            df.select(col).filter(F.col(col).isNotNull())
            .limit(sample).collect()]
    return spark.read.json(spark.sparkContext.parallelize(rows or ["{}"])) \
        .schema


def with_parsed(df: DataFrame, col: str, schema,
                out_col: str = "parsed") -> DataFrame:
    """Apply an explicit schema: one `from_json` projection. Corrupt
    rows yield NULL structs (PERMISSIVE), never task failures."""
    return df.withColumn(out_col, F.from_json(F.col(col), schema))
