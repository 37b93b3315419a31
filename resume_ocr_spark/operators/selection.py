"""Learned data selection for training corpora: DSIR importance
resampling and a hashed linear (Naive-Bayes) quality classifier.

Two standard LLM-pipeline selectors the curation family was still
missing (reference has no analogue — this is the beyond-reference
training-data tier, like :mod:`.mixture` / :mod:`.decontam`):

**DSIR** (Xie et al., NeurIPS 2023, "Data Selection for Language Models
via Importance Resampling"): score every raw document by the
log-likelihood ratio between a TARGET distribution (the high-quality
corpus you want more of) and the RAW distribution (the crawl you are
selecting from), both estimated over hashed word n-gram buckets; then
sample without replacement proportionally to the importance weights via
Gumbel top-k.

**NB classifier** (the fastText-style quality filter of GPT-3 /
CCNet-class pipelines, in closed form): a linear model over the same
hashed n-gram buckets whose per-bucket weights are Naive-Bayes log-odds
estimated from a small labeled seed set. Closed-form training keeps the
model a pure corpus statistic — reproducible, and replayable by the
DuckDB gate (an SGD fit would not be).

100 TB shape (both selectors):

  1. model estimation touches the corpus ONCE: explode hashed grams →
     ``groupBy(bucket)`` — map-side combine, output bounded by
     ``n_buckets`` (4096), collected to the driver (same bounded-collect
     posture as ``ivf_train`` / ``bpe.train``);
  2. the per-bucket weight table folds into the plan as a LITERAL int
     array (4096 nodes — two orders of magnitude under the literal-fold
     budget measured in :func:`.decontam.semantic_contamination`), so
     scoring is a zero-shuffle, zero-join single scan;
  3. Gumbel top-k is one global ``row_number`` over an integer key —
     the only corpus-wide exchange, and only in the resampling step.

Engine-stable arithmetic: all log ratios are quantized driver-side to
integer MICRO-NATS (``floor(1e6 * ln(p/q))``) so per-document scores are
exact BIGINT sums in both Spark and DuckDB — no float-summation-order
hazard at all (the ``round(,4)`` analysis the bigram entry needed is
moot here). The ``ln`` inputs are exact integer rationals and both the
driver (python ``math.log``) and DuckDB evaluate the same libm on this
host; a boundary flip of the ``floor`` needs the product to land within
1 ulp of an integer grid point (~1e-10 per bucket).

Bucket hashing is md5-derived (dialect-neutral, same trick as
:mod:`.mixture`): low 12 hex bits of ``md5(gram || ':' || salt)``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 4096          # 3 hex digits; collision rate is the DSIR design
GUMBEL_BUCKETS = 4096     # uniform grid for the Gumbel draw (md5 12-bit)
MICRO = 1_000_000         # fixed-point scale: micro-nats

# Gumbel perturbations precomputed DRIVER-side over the whole 12-bit
# grid and folded as plan literals: Spark never evaluates ln per row, so
# the module's BIGINT-exact-across-engines guarantee holds for the
# resampling key too (the JVM's Math.log is not bit-pinned to the libm
# the oracle uses; a lookup table removes the question entirely).
_GUMBEL_TABLE = [
    math.floor(-MICRO * math.log(-math.log((v + 0.5) / GUMBEL_BUCKETS)))
    for v in range(GUMBEL_BUCKETS)
]


def _toks(text_col: str):
    """Normalized word array (:func:`.dedup._tokens` semantics, NULL-total
    via coalesce). Callers materialize this as a COLUMN before building
    grams from it — inlining it into the bigram transform lambda would
    re-run the regex tokenizer once per element (higher-order-function
    lambdas get no common-subexpression elimination)."""
    return F.expr(
        "filter(split(trim(regexp_replace(lower(coalesce({c}, '')),"
        " '[^a-z0-9]+', ' ')), ' '), x -> x != '')".format(c=text_col)
    )


def _grams_from_toks(tok_col: str = "_t"):
    """Unigrams ++ space-joined bigrams from a MATERIALIZED token-array
    column (array indexing only — linear per-doc work). The CASE guards
    the descending ``sequence(1, 0)`` gotcha on sub-2-word docs."""
    t = tok_col
    return F.expr(
        f"concat({t}, "
        f"CASE WHEN size({t}) >= 2 THEN "
        f"transform(sequence(1, size({t}) - 1),"
        f" i -> concat({t}[i - 1], ' ', {t}[i])) "
        "ELSE array() END)"
    )


def _bucket(gram_col, salt: str):
    """12-bit md5 bucket of a gram (hex digits 30..32) — mirrors the
    oracle's instr()-on-hex fragment digit for digit."""
    h = F.md5(F.concat(gram_col, F.lit(f":{salt}")))
    return F.conv(F.substring(h, 30, 3), 16, 10).cast("int")


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "dsirb",
) -> DataFrame:
    """Hashed-gram term frequencies per bucket: ``(bucket, n)``. One
    explode + one groupBy whose output is bounded by ``n_buckets`` —
    map-side combine makes the shuffle tiny regardless of corpus size."""
    if n_buckets != N_BUCKETS:
        raise ValueError("bucket space is fixed at 4096 (3 md5 hex digits)")
    return (
        df.select(_toks(text_col).alias("_t"))
        .select(F.explode(_grams_from_toks("_t")).alias("_g"))
        .select(_bucket(F.col("_g"), salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _collect_counts(counts: DataFrame, n_buckets: int) -> list[int]:
    """Driver-side dense count vector (bounded collect: ≤ n_buckets rows)."""
    dense = [0] * n_buckets
    for row in counts.collect():
        dense[int(row["bucket"])] = int(row["n"])
    return dense


def log_ratio_micro(
    num_counts: list[int], den_counts: list[int]
) -> tuple[list[int], int, int]:
    """Per-bucket quantized log-likelihood ratios.

    With add-one smoothing, ``ln(p̂/q̂)`` for bucket b is
    ``ln(((num[b]+1) * (DEN+B)) / ((den[b]+1) * (NUM+B)))`` — an exact
    integer rational, floored to micro-nats. Returns
    ``(ratios, num_total, den_total)``.
    """
    b = len(num_counts)
    num_total, den_total = sum(num_counts), sum(den_counts)
    # float() each integer product BEFORE dividing — the same
    # CAST(AS DOUBLE)/CAST(AS DOUBLE) evaluation order the DuckDB oracle
    # uses, so both engines feed libm the bit-identical quotient even
    # when a product exceeds 2^53 (python int/int would correctly-round
    # the exact rational instead, a different rounding).
    ratios = [
        math.floor(MICRO * math.log(
            float((num_counts[i] + 1) * (den_total + b))
            / float((den_counts[i] + 1) * (num_total + b))
        ))
        for i in range(b)
    ]
    return ratios, num_total, den_total


def _with_grams(df: DataFrame, text_col: str) -> DataFrame:
    """Materialize the token array then the gram array as columns, so the
    tokenizer runs once per doc and downstream consumers (size + score
    fold) index the arrays instead of recomputing them."""
    return (df.withColumn("_t", _toks(text_col))
            .withColumn("_g", _grams_from_toks("_t")))


def _score_exprs(weights: list[int], salt: str, gram_col: str = "_g"):
    """Zero-shuffle scorer over a materialized gram column: fold the
    per-bucket weight table into the plan as a literal int array and sum
    ``weights[bucket(g)]`` over the doc's grams. 4096 literal nodes —
    far under the measured literal-fold budget (decontam docstring:
    ~1e5 nodes ≈ a minute of planning)."""
    lit_arr = F.array(*[F.lit(int(w)) for w in weights])
    per_gram = F.transform(
        F.col(gram_col),
        lambda g: F.element_at(lit_arr, _bucket(g, salt) + 1).cast("long"),
    )
    score = F.aggregate(
        per_gram, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return F.size(F.col(gram_col)), score


def with_dsir_logweight(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    salt: str = "dsirb",
) -> DataFrame:
    """DSIR importance weights: per corpus document,
    ``logweight_micro = Σ_grams floor(1e6·ln(p̂_target/q̂_raw))[bucket]``
    (BIGINT, exact across engines) plus ``n_grams``.

    Both distributions are hashed-bucket term frequencies with add-one
    smoothing — p̂ from ``target`` (the wanted domain; small or large,
    its estimation cost is one bounded agg either way), q̂ from the raw
    ``corpus`` itself. Empty/NULL documents score 0 from 0 grams —
    weightless, kept for the caller to veto.

    Plan: two bucket-count aggs (each ≤ 4096 output rows, bounded
    driver collect) + ONE zero-shuffle scoring scan of the corpus.
    """
    q_raw = _collect_counts(bucket_counts(corpus, text_col, salt=salt),
                            N_BUCKETS)
    p_tgt = _collect_counts(
        bucket_counts(target, target_text_col or text_col, salt=salt),
        N_BUCKETS)
    if sum(p_tgt) == 0:
        raise ValueError("target side has no grams — cannot fit p̂")
    ratios, _, _ = log_ratio_micro(p_tgt, q_raw)
    n_grams, score = _score_exprs(ratios, salt)
    return _with_grams(corpus, text_col).select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        score.alias("logweight_micro"),
    )


def gumbel_key_micro(id_col: str, logweight_col: str, seed: str = "dsir-g"):
    """Integer Gumbel perturbation for top-k sampling without replacement
    (Vieira 2014 / the DSIR resampling step): ``key = logw + G`` where
    ``G = floor(-1e6·ln(-ln(u)))`` and ``u = (md5_12bit(id)+0.5)/4096``.
    G comes from the driver-precomputed ``_GUMBEL_TABLE`` literal (see
    top of module) — Spark does a pure array lookup, no per-row ln, so
    the key is BIGINT-exact vs any libm-based oracle. Grid collisions
    (two ids sharing a 12-bit bucket) fall to the deterministic id
    tie-break in :func:`gumbel_topk`, same as any quantized draw."""
    garr = F.array(*[F.lit(int(g)) for g in _GUMBEL_TABLE])
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    u12 = F.conv(F.substring(h, 30, 3), 16, 10).cast("int")
    g_micro = F.element_at(garr, u12 + 1).cast("long")
    return (F.col(logweight_col) + g_micro).alias("gumbel_key_micro")


def dsir_resample(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    seed: str = "dsir-g",
) -> DataFrame:
    """Sample ``k`` documents without replacement, proportionally to DSIR
    importance weights, via Gumbel top-k: rank by
    ``logweight_micro + floor(-1e6·ln(-ln(u)))`` (BIGINT) descending,
    id ascending tie-break. The only corpus-wide exchange is the final
    global top-k window; at cluster scale Spark runs it as per-partition
    top-k + single-reducer merge of k·P rows.

    NOTE: a true global ``row_number`` has a single-reducer final step —
    that is inherent to exact global top-k and fine for k in the 1e6
    range; for "keep ~x%" semantics at 10^12 docs use the threshold form
    (filter on ``gumbel_key_micro`` ≥ a quantile estimated from a
    sample) instead.
    """
    if k <= 0:  # validate BEFORE the eager model fit, not after it
        raise ValueError("k must be positive")
    weighted = with_dsir_logweight(
        corpus, target, id_col, text_col, target_text_col)
    return gumbel_topk(weighted, k, id_col=id_col, seed=seed)


def gumbel_topk(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logweight_col: str = "logweight_micro",
    seed: str = "dsir-g",
) -> DataFrame:
    """The sampling step alone, over a precomputed weight table — for
    callers (e.g. tools/submit_selection.py) that materialize the weights
    once for auditing and then sample from them without re-fitting."""
    if k <= 0:
        raise ValueError("k must be positive")
    keyed = weighted.select(
        "*", gumbel_key_micro(id_col, logweight_col, seed))
    w = Window.orderBy(F.col("gumbel_key_micro").desc(), F.col(id_col).asc())
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def dsir_threshold_sample(
    corpus: DataFrame,
    target: DataFrame,
    keep_frac: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    seed: str = "dsir-g",
    sample_rate: float = 0.05,
    max_sample_rows: int = 2_000_000,
    sample_seed: str = "dsir-thr",
) -> DataFrame:
    """The keep-x% form of DSIR resampling for corpora where exact global
    top-k is the wrong tool (:func:`dsir_resample`'s ``row_number`` has a
    single-reducer merge — fine for k ≈ 1e6, not for keeping 25% of
    10^12 docs). Instead: estimate the ``keep_frac``-quantile of the
    Gumbel keys from a DETERMINISTIC md5 sample (bounded driver collect),
    then keep every document whose key clears it — a zero-shuffle filter.

    The threshold is the ceil(keep_frac·m)-th largest key among the m
    sampled keys (an exact integer order statistic — replayable by the
    SQL oracle bit for bit); kept fraction ≈ keep_frac within sampling
    error O(1/√m). Raises if the sample is empty (raise ``sample_rate``)
    or exceeds ``max_sample_rows`` (lower it) — both misconfigurations,
    not results. Output: the weight columns plus ``gumbel_key_micro``
    and the applied ``threshold_micro``.
    """
    weighted = with_dsir_logweight(
        corpus, target, id_col, text_col, target_text_col)
    return gumbel_threshold_filter(
        weighted, keep_frac, id_col=id_col, seed=seed,
        sample_rate=sample_rate, max_sample_rows=max_sample_rows,
        sample_seed=sample_seed)


def gumbel_threshold_filter(
    weighted: DataFrame,
    keep_frac: float,
    id_col: str = "doc_id",
    logweight_col: str = "logweight_micro",
    seed: str = "dsir-g",
    sample_rate: float = 0.05,
    max_sample_rows: int = 2_000_000,
    sample_seed: str = "dsir-thr",
) -> DataFrame:
    """The threshold step alone, over a precomputed weight table — for
    callers (tools/submit_selection.py) that materialize the weights once
    and then select without re-fitting. See
    :func:`dsir_threshold_sample` for semantics."""
    from .mixture import with_sample_bucket

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    if not 0.0 < sample_rate <= 1.0:
        raise ValueError(f"sample_rate must be in (0, 1]: {sample_rate}")
    keyed = weighted.select(
        "*", gumbel_key_micro(id_col, logweight_col, seed))
    # sample membership via the shared 16-bit recipe (mixture owns it)
    sample_keys = [
        int(r["gumbel_key_micro"])
        for r in (with_sample_bucket(keyed, id_col=id_col,
                                     seed=sample_seed,
                                     out_col="_thr_bucket")
                  .filter(F.col("_thr_bucket")
                          < F.lit(int(sample_rate * 65536)))
                  .select("gumbel_key_micro")
                  .limit(max_sample_rows + 1).collect())
    ]
    if not sample_keys:
        raise ValueError("threshold sample is empty — raise sample_rate")
    if len(sample_keys) > max_sample_rows:
        raise ValueError(
            f"threshold sample exceeds max_sample_rows={max_sample_rows}; "
            "lower sample_rate")
    m = len(sample_keys)
    rank = math.ceil(keep_frac * m)  # 1-based from the top
    threshold = sorted(sample_keys, reverse=True)[rank - 1]
    # cast: F.lit picks int32 vs int64 by VALUE — the schema must not
    # depend on where the quantile happens to land
    return (keyed
            .withColumn("threshold_micro",
                        F.lit(int(threshold)).cast("long"))
            .filter(F.col("gumbel_key_micro")
                    >= F.col("threshold_micro")))


def nb_train_micro(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    salt: str = "nbq",
) -> tuple[list[int], int]:
    """Closed-form Naive-Bayes fit over hashed gram buckets: returns
    ``(weights_micro, bias_micro)`` where ``weights[b] =
    floor(1e6·ln(P(b|pos)/P(b|neg)))`` with add-one smoothing and
    ``bias = floor(1e6·ln(N_pos/N_neg))`` (class prior log-odds over
    total gram mass). One pass over the labeled seed, two bounded aggs.
    """
    pos = labeled.filter(F.col(label_col))
    neg = labeled.filter(~F.col(label_col))
    c_pos = _collect_counts(bucket_counts(pos, text_col, salt=salt),
                            N_BUCKETS)
    c_neg = _collect_counts(bucket_counts(neg, text_col, salt=salt),
                            N_BUCKETS)
    n_pos, n_neg = sum(c_pos), sum(c_neg)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("both classes need at least one gram to fit")
    weights, _, _ = log_ratio_micro(c_pos, c_neg)
    bias = math.floor(MICRO * math.log(float(n_pos) / float(n_neg)))
    return weights, bias


def with_nb_quality_score(
    corpus: DataFrame,
    labeled: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    labeled_text_col: str | None = None,
    salt: str = "nbq",
) -> DataFrame:
    """Score every corpus document with the hashed Naive-Bayes linear
    model fit on ``labeled``: ``nb_score_micro = bias + Σ w[bucket(g)]``
    (BIGINT, exact), ``predicted = score > 0``. Zero-gram documents
    score the bare prior — ``predicted`` then reflects the majority
    class, which callers filtering for quality should veto separately.

    This is the fastText-shaped quality filter of GPT-3-class pipelines
    with the training step made a closed-form corpus statistic; scoring
    is one zero-shuffle scan with the model folded as plan literals.
    """
    weights, bias = nb_train_micro(
        labeled, label_col, labeled_text_col or text_col, salt)
    n_grams, score = _score_exprs(weights, salt)
    return _with_grams(corpus, text_col).select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        (score + F.lit(int(bias)).cast("long")).alias("nb_score_micro"),
    ).withColumn("predicted", F.col("nb_score_micro") > 0)
