"""Deterministic corpus mixing / sampling for training-data pipelines.

Real mixture pipelines (The Pile, Llama data recipes) apply per-source
WEIGHTS as sampling rates, not exact counts — that keeps the operator a
broadcast join + filter with zero shuffles of the corpus, the only form
that survives 100 TB. The decision hash is md5-derived (dialect-neutral:
hex substring → 16-bit bucket, the same trick :func:`.dedup.simhash`
uses), so runs are reproducible across engines, repartitions, and retries
and a DuckDB oracle can replay the exact keep-set.

``stratified_topk`` is the exact-count companion for SMALL group
cardinalities (languages, sources): a per-group window over hash order.
Its parallelism is bounded by the number of groups — documented, and the
reason the rate-based form is the default at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

BUCKETS = 1 << 16  # md5-derived bucket space; rates quantize to 1/65536


def bucket16_expr(key_col, seed: str):
    """The 16-bit md5 bucket as a bare Column expression — THE single
    copy of the hash recipe (low 16 bits of md5(key ':' seed)).
    :func:`with_sample_bucket` wraps it; ``privacy._laplace_noise``
    consumes it for the DP uniform; the oracles' ``_mixd``/``_sp16``/
    ``_dpd`` SQL fragments mirror it."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 29, 4), 16, 10).cast("long")


def with_sample_bucket(
    df: DataFrame, id_col: str = "doc_id", seed: str = "mix",
    out_col: str = "bucket",
) -> DataFrame:
    """Uniform deterministic bucket in [0, 65536): low 16 bits of
    md5(id ':' seed). Changing ``seed`` draws an independent sample.
    ``out_col`` lets internal callers avoid clobbering a caller's own
    ``bucket`` column — the recipe itself lives in
    :func:`bucket16_expr`."""
    return df.withColumn(out_col, bucket16_expr(F.col(id_col), seed))


def weighted_mixture(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    seed: str = "mix",
) -> DataFrame:
    """Keep each row with probability ``weights[group]`` (deterministic in
    (id, seed)): bucket < floor(weight * 65536). Groups absent from
    ``weights`` get ``default_weight``. Plan: broadcast hash join on the
    tiny weights table + filter — the corpus never shuffles."""
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight out of [0,1] for {g!r}: {w}")
    if not 0.0 <= default_weight <= 1.0:
        raise ValueError(f"default_weight out of [0,1]: {default_weight}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(w * BUCKETS)) for g, w in sorted(weights.items())],
        f"{group_col} string, _cut int",
    )
    out = (
        with_sample_bucket(df, id_col, seed)
        .join(F.broadcast(wdf), group_col, "left")
        .withColumn(
            "_cut", F.coalesce(F.col("_cut"), F.lit(int(default_weight * BUCKETS)))
        )
        .filter(F.col("bucket") < F.col("_cut"))
        .drop("_cut")
    )
    return out


def leakage_safe_split(
    df: DataFrame,
    test_frac: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    groups: DataFrame | None = None,
    group_col: str = "group_key",
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/test split that can NOT leak duplicates across
    the boundary: the split decision is a function of a duplicate-GROUP
    key, never the document id, so every copy of a document lands on the
    same side (the classic eval-contamination failure of naive
    per-row splits).

    Group key: the normalization fingerprint by default (byte-identical
    post-normalization copies stay together, zero extra cost — the whole
    operator is then a zero-shuffle projection), or join a precomputed
    near-dup assignment ``groups`` = (id_col, group_col) — e.g.
    :func:`.dedup.dedup_clusters` output — to also pin fuzzy duplicates
    to one side; ids absent from ``groups`` fall back to their
    fingerprint. The decision is the usual md5 16-bit bucket of
    ``group_key`` under ``seed``: bucket < floor(test_frac·65536) →
    'test'. NULL-text docs keep with_fingerprint's NULL fingerprint and
    fall into 'train' (NULL comparison), documented rather than coerced.

    100 TB shape: default form never shuffles; the ``groups`` form costs
    the one join (broadcast while the assignment is small, AQE-shuffled
    otherwise — duplicates are a minority so the assignment is far
    smaller than the corpus)."""
    from .textstats import with_fingerprint

    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac out of [0,1]: {test_frac}")
    out = with_fingerprint(df, text_col)
    if groups is not None:
        # the assignment must be a FUNCTION id → cluster: an id in two
        # clusters either fans the doc out to rows that can straddle the
        # split, or (collapsed) silently separates it from half its
        # duplicates — both break the no-leak contract, so a
        # multi-assignment is refused as a misconfiguration (transitively
        # close it first: dedup_clusters output is one-row-per-id by
        # construction). The check costs one agg on the SMALL side.
        dup = (groups.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"groups assigns id {dup[0][id_col]!r} to multiple "
                "clusters — pass a one-row-per-id assignment (e.g. "
                "dedup_clusters output), transitively closed")
        g = groups.select(
            F.col(id_col), F.col(group_col).cast("string").alias("_grp"))
        out = (out.join(g, id_col, "left")
               .withColumn("group_key",
                           F.coalesce(F.col("_grp"), F.col("fingerprint")))
               .drop("_grp"))
    else:
        out = out.withColumn("group_key", F.col("fingerprint"))
    cut = int(test_frac * BUCKETS)
    # the shared md5 16-bit bucket under a private name — a caller's own
    # 'bucket' column must survive the round trip
    out = with_sample_bucket(out, id_col="group_key", seed=seed,
                             out_col="_split_bucket")
    return out.drop("fingerprint").withColumn(
        "split",
        F.when(F.col("_split_bucket") < F.lit(cut), F.lit("test"))
        .otherwise(F.lit("train")),
    ).drop("_split_bucket")


def stratified_topk(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Exactly ``k`` rows per group, chosen by hash order (bucket asc, id
    asc tie-break) — deterministic quota sampling. Window partitions by
    group: parallelism = #groups, so this is for LOW-cardinality strata
    (languages, sources); use :func:`weighted_mixture` when groups are
    many or huge."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy("bucket", id_col)
    return (
        with_sample_bucket(df, id_col, seed)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def temperature_mixture(
    df: DataFrame,
    target_rows: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    seed: str = "tmix",
    max_groups: int = 100_000,
) -> DataFrame:
    """Temperature-scaled source sampling (the T5/mT5 multilingual mix):
    draw ≈ ``target_rows`` documents with per-group probability
    ``q_g ∝ p_g^alpha`` where ``p_g`` is the group's corpus share —
    ``alpha < 1`` flattens the mixture toward rare groups (mT5 uses
    0.3, 0.5 is a common default), ``alpha = 1`` reproduces the
    natural distribution.

    Engine-stable arithmetic: per-group scores are quantized to BIGINT
    micro-units ``s_g = floor(f(c_g) · 1e6)`` (``f = sqrt`` when
    ``alpha = 0.5`` — IEEE-correctly-rounded in every engine, so the
    DuckDB oracle replays it bit-for-bit; general ``alpha`` uses
    ``pow``, same quantization), then the keep rate is EXACT integer
    arithmetic: ``rate_g = min(2^32, (2^32 · K · s_g) // (S · c_g))``
    with ``S = Σ s_g``, applied as a 32-BIT md5 bucket filter (hex
    digits 25–32 under ``seed`` — 16 bits would floor a dominant
    group's per-doc rate to 0 whenever ``K·q_g < c_g/65536``, e.g. any
    1e9-doc group at K=300; 32 bits pushes that boundary to
    ``c_g/2^32``, and crossing it raises instead of silently dropping
    the group). Expected take from group g is ``≈ K·q_g`` capped at
    the group size (no replacement — a group too small for its
    temperature share contributes all it has, standard undersampling
    behavior).

    100 TB shape: ONE map-side-combined ``groupBy(group)`` count
    (output bounded by ``max_groups``, collected like the other model
    statistics), rates folded into a broadcast table, then a
    zero-shuffle bucket filter — the corpus never shuffles.

    Output: ``(group_col, id_col, bucket, rate)``."""
    import math

    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive: {target_rows}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0: {alpha}")
    counts = (df.groupBy(group_col).count()
              .limit(max_groups + 1).collect())
    if not counts:
        raise ValueError("corpus is empty — nothing to mix")
    if len(counts) > max_groups:
        raise ValueError(
            f"more than max_groups={max_groups} groups; raise the cap "
            "or pre-bucket the group column")
    if any(r[group_col] is None for r in counts):
        raise ValueError("NULL group values — clean or coalesce "
                         f"{group_col} first")
    c = {r[group_col]: int(r["count"]) for r in counts}
    if alpha == 0.5:
        s = {g: math.floor(math.sqrt(n) * 1e6) for g, n in c.items()}
    else:
        s = {g: math.floor((n ** alpha) * 1e6) for g, n in c.items()}
    total = sum(s.values())
    space = BUCKETS * BUCKETS  # 2^32
    rates = {
        g: min(space, (space * target_rows * s[g]) // (total * c[g]))
        for g in c
    }
    # a group whose temperature share rounds to a ≥1-doc expected take
    # must never quantize to rate 0 — that is a silent drop, not noise
    starved = sorted(g for g in c
                     if rates[g] == 0 and target_rows * s[g] >= total)
    if starved:
        raise ValueError(
            "rate quantization floored these groups to 0 despite an "
            f"expected take >= 1 doc: {starved[:5]} — their per-doc keep "
            "probability is below 2^-32; split them (sub-bucket the "
            "group column) or raise target_rows")
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        [(g, int(r)) for g, r in sorted(rates.items())],
        StructType([df.schema[group_col],
                    StructField("rate", LongType(), False)]),
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    bucketed = df.withColumn(
        "bucket", F.conv(F.substring(h, 25, 8), 16, 10).cast("long"))
    return (
        bucketed
        .join(F.broadcast(rdf), group_col, "inner")
        .filter(F.col("bucket") < F.col("rate"))
        .select(group_col, id_col, "bucket", "rate")
    )
