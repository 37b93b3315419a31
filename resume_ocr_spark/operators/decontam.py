"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by shared word n-grams.

The standard LLM-pipeline recipe (GPT-3 appendix C / Llama-style 13-gram
overlap): shingle the benchmark into word n-grams, shingle each candidate
training document the same way, and flag any document sharing at least
``threshold`` n-grams with the benchmark.

100 TB shape — the benchmark side is always small (an eval suite is at most
~10^6 n-grams), the corpus side is the 100 TB one:

  1. benchmark n-grams are distinct-hashed to 8-byte ``xxhash64`` keys and
     BROADCAST — the corpus never shuffles to meet them;
  2. the corpus side explodes its per-doc distinct shingles map-side and
     inner-joins the broadcast set, so everything surviving the join is
     already tiny (only contaminated grams);
  3. the only shuffle is the per-doc count of those matched grams.

``decontaminate`` then drops flagged docs with a LEFT ANTI join against the
matched-id set; AQE picks a broadcast anti-join while the contaminated set
fits, and degrades to a shuffled hash anti-join when it does not — both are
scale-safe (the corpus is never replicated).

Shingling reuses :mod:`.dedup`'s normalization (lowercase, alphanumeric
words, space-joined windows) so dedup and decontamination agree on what a
"word" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles

DECONTAM_NGRAM = 13  # GPT-3 appendix C uses 13-gram overlap


def _benchmark_gram_hashes(
    benchmark: DataFrame, text_col: str, n: int
) -> DataFrame:
    """Distinct xxhash64 keys of the benchmark's word n-grams (small side)."""
    grams = _shingles(
        benchmark.select(F.monotonically_increasing_id().alias("_bid"),
                         F.col(text_col)),
        "_bid", text_col, n,
    )
    return grams.select(F.xxhash64("word").alias("_gram_hash")).distinct()


def contamination_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECONTAM_NGRAM,
    threshold: int = 1,
) -> DataFrame:
    """Per-document benchmark-overlap counts.

    Returns ``(id_col, contaminated_ngrams: long, contaminated: boolean)``
    for every document with at least one matching n-gram; clean documents
    are absent (callers wanting a full annotation LEFT-join this back and
    ``coalesce`` the count to 0). ``id_col`` must be unique per row: gram
    distinctness is per-row, so a duplicated id would double-count its
    matched grams.
    """
    bench = _benchmark_gram_hashes(benchmark, bench_text_col, n)
    doc_grams = _shingles(docs, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("word").alias("_gram_hash")
    )
    return (
        doc_grams.join(F.broadcast(bench), "_gram_hash", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
        .withColumn(
            "contaminated",
            F.col("contaminated_ngrams") >= F.lit(threshold),
        )
    )


SEMANTIC_BENCH_CAP = 20_000  # max benchmark vectors folded into the plan


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
    threshold: float = 0.9,
    bench_cap: int = SEMANTIC_BENCH_CAP,
) -> DataFrame:
    """Embedding-space decontamination — the semantic sibling of the
    n-gram overlap check: flag corpus documents whose embedding is within
    cosine ``threshold`` of ANY benchmark embedding (catches paraphrased /
    reformatted eval leakage that shares no 13-gram).

    Returns every corpus row plus ``max_benchmark_cosine`` (rounded to 6)
    and ``contaminated``.

    100 TB shape: the benchmark embeddings are collected once (bounded by
    ``bench_cap`` via limit — an eval suite is small by definition) and
    folded into the plan as a LITERAL array of vectors; per corpus row the
    max cosine is an array expression (transform + zip_with folds) — zero
    joins, zero shuffles, the corpus is scanned exactly once. Benchmarks
    past the cap should go through an LSH prune (the
    :func:`~.similarity.lsh_signature` banding) before the exact pass."""
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold out of [-1, 1]: {threshold}")
    rows = (benchmark.select(bench_vec_col)
            .limit(bench_cap + 1).collect())
    if len(rows) > bench_cap:
        raise ValueError(
            f"benchmark side exceeds bench_cap={bench_cap} vectors; "
            "LSH-prune the corpus against a banded benchmark first")
    if not rows:
        return (corpus
                .withColumn("max_benchmark_cosine",
                            F.lit(None).cast("double"))
                .withColumn("contaminated", F.lit(False)))
    from .similarity import _array_cosine

    bench_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in r[bench_vec_col]]) for r in rows
    ])
    vec = F.col(vec_col).cast("array<double>")
    max_cos = F.array_max(
        F.transform(bench_lit, lambda b: _array_cosine(vec, b)))
    return (
        corpus
        .withColumn("max_benchmark_cosine", F.round(max_cos, 6))
        .withColumn("contaminated",
                    F.col("max_benchmark_cosine") >= F.lit(threshold))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECONTAM_NGRAM,
    threshold: int = 1,
) -> DataFrame:
    """Drop documents sharing ≥ ``threshold`` word n-grams with the
    benchmark; the surviving frame keeps the input schema unchanged."""
    flagged = (
        contamination_counts(
            docs, benchmark, id_col, text_col, bench_text_col, n, threshold
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")
