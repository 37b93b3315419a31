"""Margin-based bitext mining — the CCMatrix/LASER parallel-corpus
miner (Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining
with Multilingual Sentence Embeddings"; Schwenk et al. 2021 CCMatrix).

Given two embedding sides (source-language sentences X, target-language
sentences Y), raw cosine is a poor alignment score — hubs score high
against everything. The ratio margin fixes it by normalizing each
pair's cosine by the mean similarity of both endpoints' k-nearest
neighborhoods::

    margin(x, y) = cos(x, y) / ( (avgk(x) + avgk(y)) / 2 )

where ``avgk(x)`` is the mean cosine of x to its k nearest candidates
on the OTHER side. Mined pairs are each source's best-margin target
above a threshold (margin > 1 ⇔ the pair stands out from both
neighborhoods).

Determinism contract (the gate must hash-match DuckDB): cosines are
quantized to integer micro-cosines (round(cos·10⁶) as BIGINT) right
after the grouped-sum dot product — every downstream aggregate
(neighborhood sums, counts) is then exact BIGINT arithmetic, and the
margin is ONE float division of exact integers, rounded to 6::

    margin = round( 2·c·cntx·cnty / (sumx·cnty + sumy·cntx), 6 )

so summation order can never flip a digit (the repo's integer-score
rule, cf. selection.py micro-nats).

100 TB shape: the all-pairs ``cross_cosines`` is the small-scale /
oracle baseline (element-index equi-join, same as
``similarity.cosine_pairs``). At scale, margins are computed over an
ANN candidate list exactly as production CCMatrix does (FAISS k-NN
there, the banded/IVF family here): ``lsh_candidates_cross`` buckets
both sides by shared hyperplane-LSH bands — corpus-sized sides never
all-pair — and ``margin_scores(..., candidates=...)`` restricts every
cosine and both neighborhood averages to the candidate graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: neighborhood size for the margin denominators
MARGIN_K = 4
#: micro-cosine quantization (1e6 ⇒ 6 decimal digits preserved)
MICRO = 1_000_000.0


def _side(df: DataFrame, id_col: str, vec_col: str, out_id: str,
          out_val: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("i", out_val))


def cross_cosines(
    src: DataFrame,
    tgt: DataFrame,
    id_src: str = "src_id",
    id_tgt: str = "tgt_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(src_id, tgt_id, c) micro-cosines between the two sides — every
    cross pair, or only ``candidates`` (src_id, tgt_id) when given.

    Element-index equi-join + grouped sums (the dialect-neutral
    formulation the oracle restates); the unrestricted form degenerates
    toward all-pairs and is the tail baseline only."""
    a = _side(src, id_src, vec_col, "src_id", "va")
    b = _side(tgt, id_tgt, vec_col, "tgt_id", "vb")
    if candidates is not None:
        a = a.join(candidates.select("src_id", "tgt_id").distinct(), "src_id")
        joined = a.join(b, ["tgt_id", "i"])
    else:
        joined = a.join(b, "i")
    return (
        joined.groupBy("src_id", "tgt_id")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"),
             F.sum(F.col("va") * F.col("va")).alias("na"),
             F.sum(F.col("vb") * F.col("vb")).alias("nb"))
        .select(
            "src_id", "tgt_id",
            F.round(F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))
                    * MICRO, 0).cast("bigint").alias("c"))
    )


def margin_scores(
    src: DataFrame,
    tgt: DataFrame,
    k: int = MARGIN_K,
    id_src: str = "src_id",
    id_tgt: str = "tgt_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Per candidate pair: micro-cosine ``c`` and ratio ``margin``.

    Neighborhood terms are per-side windows over the candidate cosines
    (top-k by (c desc, id asc) — deterministic tie-break), summed as
    exact BIGINTs; the margin is one float division, rounded to 6."""
    cos = cross_cosines(src, tgt, id_src, id_tgt, vec_col, candidates)

    wf = Window.partitionBy("src_id").orderBy(F.desc("c"), F.asc("tgt_id"))
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("c"), F.asc("src_id"))
    fwd = (cos.withColumn("_r", F.row_number().over(wf))
           .filter(F.col("_r") <= k)
           .groupBy("src_id")
           .agg(F.sum("c").alias("sumx"),
                F.count("*").cast("bigint").alias("cntx")))
    bwd = (cos.withColumn("_r", F.row_number().over(wb))
           .filter(F.col("_r") <= k)
           .groupBy("tgt_id")
           .agg(F.sum("c").alias("sumy"),
                F.count("*").cast("bigint").alias("cnty")))
    return (
        cos.join(fwd, "src_id").join(bwd, "tgt_id")
        .select(
            "src_id", "tgt_id", "c",
            F.round(
                2.0 * F.col("c") * F.col("cntx") * F.col("cnty")
                / (F.col("sumx") * F.col("cnty")
                   + F.col("sumy") * F.col("cntx")), 6).alias("margin"))
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = MARGIN_K,
    threshold: float = 1.0,
    id_src: str = "src_id",
    id_tgt: str = "tgt_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Mined pairs: each source's best-margin target (margin desc,
    tgt_id asc tie-break) with margin ≥ ``threshold``. Output:
    (src_id, tgt_id, c, margin)."""
    m = margin_scores(src, tgt, k, id_src, id_tgt, vec_col, candidates)
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id"))
    return (
        m.withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") == 1) & (F.col("margin") >= threshold))
        .drop("_r")
    )


def lsh_candidates_cross(
    src: DataFrame,
    tgt: DataFrame,
    dim: int,
    id_src: str = "src_id",
    id_tgt: str = "tgt_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 2,
    max_bucket_side: int = 10_000,
) -> DataFrame:
    """Cross-side LSH candidate pairs — the 100 TB pruning stage: both
    sides signed by the SAME random hyperplanes (similarity._planes), a
    band equi-join pairs rows sharing any signature band, so similar
    cross-lingual embeddings collide while the corpus never all-pairs.
    ``max_bucket_side`` caps either side of a band bucket (degenerate
    buckets — the mega-bucket lever every banded operator here carries).
    Output: distinct (src_id, tgt_id)."""
    from .similarity import lsh_signature

    bits = n_planes // n_bands

    def bands(df, idc, out):
        sig = lsh_signature(df, dim, idc, vec_col, n_planes)
        rows = sig.select(
            F.col(idc).alias(out),
            *[(F.shiftrightunsigned(F.col("lsh_sig"), b * bits)
               % (1 << bits)).alias(f"b{b}") for b in range(n_bands)])
        out_bands = None
        for b in range(n_bands):
            part = rows.select(
                out, F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket"))
            out_bands = part if out_bands is None else out_bands.unionByName(part)
        return out_bands

    a = bands(src, id_src, "src_id")
    b = bands(tgt, id_tgt, "tgt_id")
    # cap pathological buckets on each side before the join
    wa = Window.partitionBy("band", "bucket").orderBy("src_id")
    wb = Window.partitionBy("band", "bucket").orderBy("tgt_id")
    a = (a.withColumn("_r", F.row_number().over(wa))
         .filter(F.col("_r") <= max_bucket_side).drop("_r"))
    b = (b.withColumn("_r", F.row_number().over(wb))
         .filter(F.col("_r") <= max_bucket_side).drop("_r"))
    return a.join(b, ["band", "bucket"]).select("src_id", "tgt_id").distinct()
