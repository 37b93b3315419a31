"""Differentially-private release of corpus statistics (data-card counts).

Publishing per-group corpus statistics (language/source histograms, token
totals) alongside a trained model leaks membership at the margins; the
standard fix is the Laplace mechanism (Dwork et al. 2006): release
``true + Lap(sensitivity/ε)``. Groups are disjoint row partitions, so one
noisy count per group is ε-DP for the whole histogram (parallel
composition).

Mechanism shape, Spark-first: the noise is an inverse-CDF transform of a
uniform, computed as pure Column arithmetic on top of the repo's 16-bit
md5 bucket (``mixture.with_sample_bucket``'s recipe) — the release plan
is one groupBy plus a zero-shuffle projection, and a DuckDB oracle can
replay it exactly.

DETERMINISM CAVEAT (honest limits, same spirit as the codec stubs): a
seeded hash uniform makes the release reproducible and gate-checkable,
but a DP guarantee requires the adversary not to know the noise — in
production the seed must stay secret, or the hash draw swapped for a
CSPRNG; the mechanism, sensitivity accounting, and plan shape are
unchanged. The 16-bit quantization truncates the Laplace tails at
±b·ln(65536) ≈ 11.1·b and coarsens draws to ~1/65536 — negligible for
release statistics, also swap-out-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mixture import BUCKETS, bucket16_expr


def _laplace_noise(key_col, b: float, seed: str, stat: str):
    """Lap(b) via inverse CDF of the deterministic 16-bit md5 uniform:
    u = (bucket(key, seed:stat) + 0.5) / 65536 ∈ (0, 1), then
    −b·sign(u−½)·ln(1−2|u−½|). u can never be exactly ½ (half-integer
    numerator), so sign() never returns 0.

    ``stat`` folds the STATISTIC IDENTITY (count vs sum, ε, clip, value
    column) into the draw key: without it, two releases over the same
    groups would share one uniform per group, and a linear combination
    (e.g. dp_sum − clip·dp_count) cancels the correlated noise EXACTLY —
    a mechanism-level break no secret seed prevents (review r5).
    Different statistics therefore draw independent uniforms."""
    bucket = bucket16_expr(key_col, f"{seed}:{stat}")
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(BUCKETS))
    half = u - F.lit(0.5)
    return (F.lit(-b) * F.signum(half)
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(half)))


def dp_group_counts(
    df: DataFrame, group_col: str = "lang", epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """ε-DP group-count histogram: COUNT(*) per group + Lap(1/ε), clamped
    at 0 (post-processing preserves DP). Sensitivity is 1 — each row
    (document) contributes to exactly one group's count; for user-level
    privacy, first collapse each user's rows to one contribution.

    100 TB shape: the one hash shuffle of the count agg (map-side
    combined); the noise is a per-GROUP projection on the already-tiny
    grouped result. Returns (group, dp_count) with dp_count rounded to 4
    — the release, no true counts."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive: {epsilon}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    noise = _laplace_noise(F.col(group_col), 1.0 / epsilon, seed,
                           f"count:eps={float(epsilon)}")
    return counts.select(
        group_col,
        F.round(F.greatest(F.lit(0.0), F.col("_n") + noise), 4)
        .alias("dp_count"),
    )


def dp_group_sums(
    df: DataFrame, group_col: str, value_col: str, clip: float,
    epsilon: float = 1.0, seed: str = "dp",
) -> DataFrame:
    """ε-DP per-group SUM of a clipped value (token totals, byte sizes):
    each row's contribution is clamped to [0, clip] BEFORE aggregation —
    that bound IS the sensitivity, so the release adds Lap(clip/ε).
    Unbounded values would make the sensitivity (and the required noise)
    infinite; the clip is the standard contribution bound, chosen from
    public knowledge (e.g. a max-sequence-length), never from the data.

    Same plan as :func:`dp_group_counts`: one combined agg shuffle plus a
    grouped-size projection."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive: {epsilon}")
    if clip <= 0:
        raise ValueError(f"clip must be positive: {clip}")
    clamped = F.least(F.greatest(F.col(value_col).cast("double"),
                                 F.lit(0.0)), F.lit(float(clip)))
    sums = df.groupBy(group_col).agg(F.sum(clamped).alias("_s"))
    noise = _laplace_noise(
        F.col(group_col), clip / epsilon, seed,
        f"sum:{value_col}:clip={float(clip)}:eps={float(epsilon)}")
    return sums.select(
        group_col,
        F.round(F.greatest(F.lit(0.0), F.col("_s") + noise), 4)
        .alias("dp_sum"),
    )
