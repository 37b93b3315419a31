"""Corpus retrieval scoring — BM25 over the documents table.

The lexical-retrieval pass a training-data pipeline runs for targeted
corpus construction (pull documents matching a topic query before the
quality/dedup funnel) and for decontamination auditing (which corpus
documents score high against an eval question).  Complements the
embedding-space family in :mod:`similarity` (dense ANN) with the sparse
scorer production systems still run beside it.

Okapi BM25 with the Lucene/Robertson always-positive idf:

    idf(t)  = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score   = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·len/avgdl))

100 TB shape: the QUERY is tiny (a handful of terms), so everything
per-term is driver-side arithmetic.  Pass 1 computes the corpus stats
the formula needs — N, avgdl, and df_t per query term — as ONE
aggregation with map-side combine (per-term df via conditional sums:
no explode, no per-word shuffle, output is a single row).  Pass 2 is a
ZERO-SHUFFLE projection: tf per term is an array count inside the row,
idf values are folded in as literals.  Scoring 100 TB costs one full
scan and nothing else; no inverted index is materialized (for repeated
query workloads, build one — this operator is the one-shot scan path).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens


def _query_terms(query: str) -> list[str]:
    """Normalize the query exactly like the corpus tokenizer (lowercase,
    alnum runs), dedup preserving order."""
    import re

    seen: dict[str, None] = {}
    for w in re.sub(r"[^a-z0-9]+", " ", (query or "").lower()).split():
        seen.setdefault(w)
    return list(seen)


def bm25_scores(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query``; returns ``(id_col,
    n_terms_matched, bm25)`` with ``bm25`` rounded to 4 decimals (the
    repo's log-expression hash-gating rule — Spark and libm ``ln``
    differ by 1 ulp on ~4% of inputs).

    NULL/empty documents score 0.0 with 0 matches (totality).  A query
    with no alphanumeric terms raises ``ValueError`` — an all-zero
    score column would silently rank nothing."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("query has no alphanumeric terms")
    # coalesce BEFORE tokenizing: size(NULL) is NULL (not -1) and would
    # poison _len → avgdl and every per-term tf for NULL-text docs
    toks = F.filter(_tokens("_txt"), lambda x: x != "")
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    ).select(F.col(id_col), toks.alias("_t"))
    # terms are alnum-only by construction (safe to inline); a two-arg
    # lambda via F.filter would be misread as (element, index)
    tf_cols = [
        F.expr(f"size(filter(_t, x -> x = '{t}'))").alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    with_tf = base.select(F.col(id_col), F.size("_t").alias("_len"), *tf_cols)

    # pass 1: N, avgdl, df_t — one partial-aggregated reduction to a
    # single row; the only action before the scoring projection
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("_len").alias("avgdl"),
        *[F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
          for i in range(len(terms))],
    ).collect()[0]
    n_docs = stats["n_docs"]
    avgdl = float(stats["avgdl"] or 0.0)
    if n_docs == 0 or avgdl == 0.0:
        return with_tf.select(
            F.col(id_col), F.lit(0).alias("n_terms_matched"),
            F.lit(0.0).alias("bm25"))
    idf = [
        math.log((n_docs - stats[f"_df_{i}"] + 0.5)
                 / (stats[f"_df_{i}"] + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    # pass 2: zero-shuffle scoring projection with idf folded as literals
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("_len") / F.lit(avgdl))
    parts = [
        F.lit(idf[i]) * F.col(f"_tf_{i}") * F.lit(k1 + 1.0)
        / (F.col(f"_tf_{i}") + norm)
        for i in range(len(terms))
    ]
    score = sum(parts[1:], parts[0])
    matched = sum(
        [(F.col(f"_tf_{i}") > 0).cast("int") for i in range(1, len(terms))],
        (F.col("_tf_0") > 0).cast("int"))
    return with_tf.select(
        F.col(id_col),
        matched.alias("n_terms_matched"),
        F.round(F.when(F.col("_len") > 0, score).otherwise(0.0), 4)
        .alias("bm25"),
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Global top-``k`` documents for ``query`` (ties broken by id for
    determinism).  ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — per-partition heaps plus a k-row driver
    merge, never a full sort of the corpus."""
    scored = bm25_scores(df, query, id_col, text_col, k1, b)
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
