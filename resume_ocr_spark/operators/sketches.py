"""Mergeable bounded-state sketches — the 10^12-row answers to the four
questions a web-scale curation pipeline asks constantly, each of which is
a cluster-killing shuffle if answered exactly:

* "how many DISTINCT urls/words/hosts per group?"  → :func:`hll_distinct`
  (HyperLogLog; Flajolet et al. 2007, public) — fixed ``m``-register
  state per group instead of a corpus-wide ``distinct`` exchange.
* "have we SEEN this url before?"                  → :func:`bloom_build` /
  :func:`bloom_probe` (Bloom 1970, public) — a broadcastable bitset
  instead of an anti-join against the full history table.
* "what are the heavy-hitter tokens and roughly how often?" →
  :func:`cms_build` / :func:`cms_estimate` (count-min sketch; Cormode &
  Muthukrishnan 2005, public) — ``d×w`` counters instead of a
  full-vocabulary aggregation.
* "what is the p95/p99 of this metric per group?"  →
  :func:`histogram_quantiles` — fixed-width bin counts (mergeable by
  SUM) instead of an exact per-group sort.

Design rules shared by all four (and with the rest of this repo):

* **Determinism across engines.** Every hash is ``md5`` over an explicit
  string recipe; every integer is extracted from md5 HEX DIGITS (the
  ``mixture.with_sample_bucket`` idiom) so a DuckDB oracle can reproduce
  the arithmetic digit-by-digit. No engine RNG, no ``hash()``.
* **Integer-exact accumulators.** The HLL harmonic sum is kept as a
  scaled BIGINT (``Σ 2^(RHO_MAX - M_j)``), Bloom words are 32-bit lanes
  inside BIGINTs (bit 63 is never touched — DuckDB raises on ``1<<63``),
  CMS counters and histogram bins are plain BIGINT sums — so no
  float-accumulation order can diverge between Spark and an oracle.
  Floats appear only in the final single-expression estimates, rounded.
* **Mergeability.** Each ``*_build`` output is a sketch TABLE whose merge
  operator is a plain aggregate (``max`` for HLL registers, ``bit_or``
  for Bloom words, ``sum`` for CMS/histogram counters) — partial sketches
  from 10^6 tasks combine map-side; nothing is driver-resident except the
  (bounded, documented) Bloom word list for the zero-shuffle probe path.

The reference has no sketch surface (it handles ≤20 docs per request —
``app/config/constants.py:4``); this family is part of the scale mandate
(BASELINE.json north_rule: 10^12 documents) where exact
distinct/membership/top-k/percentile are the queries that stop working.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hll_distinct",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_set_estimates",
    "bloom_build",
    "bloom_probe",
    "bloom_probe_join",
    "bloom_words",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "histogram_quantiles",
    "histogram_bins",
    "histogram_merge",
    "histogram_quantiles_from_bins",
]

# --- shared md5→int plumbing (mirrors mixture.with_sample_bucket) --------

def _pow2_array(n: int) -> Column:
    """Literal BIGINT array [2^0 … 2^(n-1)] — the column-indexed
    power-of-two lookup this module uses instead of variable-count bit
    shifts (Spark's shiftleft/shiftright take a PYTHON int count, and
    DuckDB raises on 1<<63; an element_at over literals is pure integer
    math with identical semantics everywhere)."""
    return F.array(*[F.lit(1 << b).cast("long") for b in range(n)])


def _pow2_at(exp: Column, n: int) -> Column:
    """2^exp as BIGINT via :func:`_pow2_array` (requires 0 ≤ exp < n)."""
    return F.element_at(_pow2_array(n), exp.cast("int") + 1)


def _hex_int(h: Column, start: int, ndigits: int) -> Column:
    """BIGINT value of md5-hex digits [start, start+ndigits) (1-based),
    i.e. ``4*ndigits`` hash bits. The DuckDB mirror is the
    ``instr('0123456789abcdef', …)`` digit-sum fragment
    (:func:`hex_int_sql`)."""
    return F.conv(F.substring(h, start, ndigits), 16, 10).cast("long")


def hex_int_sql(expr: str, start: int, ndigits: int) -> str:
    """The DuckDB twin of :func:`_hex_int`: a digit-sum over
    ``instr('0123456789abcdef', …)`` lookups, generated so oracle SQL and
    the Spark column can never drift digit-by-digit. ``expr`` must be a
    SQL expression yielding the md5 hex string."""
    terms = []
    for i in range(ndigits):
        p = start + i
        w = 16 ** (ndigits - 1 - i)
        d = f"(instr('0123456789abcdef', substring({expr}, {p}, 1)) - 1)"
        terms.append(f"{d} * {w}" if w > 1 else d)
    return "(" + " + ".join(terms) + ")"


# --- HyperLogLog -----------------------------------------------------------

# Register geometry: p=8 → m=256 registers; rho is drawn from a 20-bit
# sub-hash (5 hex digits), so rho ∈ [1, RHO_MAX=21] and the scaled
# harmonic term 2^(RHO_MAX - rho) is an exact BIGINT ≤ 2^20; the full
# scaled sum is ≤ m·2^21 = 2^29 — integer-exact in both engines.
HLL_P = 8
HLL_M = 1 << HLL_P  # 256
HLL_RHO_BITS = 20
HLL_RHO_MAX = HLL_RHO_BITS + 1  # 21 = "no 1-bit seen"
# alpha_m · m² for m=256 (Flajolet et al. 2007 eq. for m ≥ 128:
# alpha = 0.7213 / (1 + 1.079/m)).  Pasted as ONE literal into both the
# Column expression and the generated oracle so the engines agree bitwise.
HLL_ALPHA_MM = 0.7182725932495458 * HLL_M * HLL_M


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    seed: str = "hll",
) -> DataFrame:
    """The HLL sketch TABLE: one row per (group, bucket) holding the
    register maximum ``M = max(rho)``. ≤ ``HLL_M`` rows per group
    regardless of input size — this is the state that replaces a
    corpus-wide distinct. Merging two sketches = union + ``max`` regroup
    (pure re-aggregation; no rescan).

    Hash recipe: ``h = md5(value ':' seed)``; bucket = hex digits 1-2
    (8 bits = p), rho = 1 + leading zeros of the 20-bit integer at hex
    digits 3-7 (via ``bin``/``lpad``/``instr`` — string math, no log2).
    """
    h = F.md5(F.concat(F.col(value_col).cast("string"), F.lit(f":{seed}")))
    bucket = _hex_int(h, 1, 2).alias("bucket")
    sub = _hex_int(h, 3, 5)
    binstr = F.lpad(F.bin(sub), HLL_RHO_BITS, "0")
    first_one = F.instr(binstr, "1")
    rho = F.when(first_one == 0, F.lit(HLL_RHO_MAX)).otherwise(first_one)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket, rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("m_reg"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    seed: str = "hll",
) -> DataFrame:
    """Per-group approximate distinct count from :func:`hll_registers`.

    Output: ``(group…, n_buckets int, s_scaled bigint, est_distinct
    double)`` where ``s_scaled = Σ_nonempty 2^(RHO_MAX - M_j) +
    zeros·2^RHO_MAX`` is the integer-exact scaled harmonic sum and
    ``est_distinct`` is the (rounded-to-4) HLL estimate with the standard
    small-range linear-counting correction (E ≤ 2.5m and zeros > 0 →
    ``m·ln(m/zeros)``). Exactly two expressions touch floats: the final
    division and the ln — each computed once per group from integer
    inputs, so Spark and a SQL oracle agree to well under the rounding.

    100 TB shape: stage 1 shuffles (group, bucket) — bounded at
    ``m·|groups|`` rows with map-side combine; stage 2 shuffles the
    register table (tiny). The raw values never move."""
    regs = hll_registers(df, value_col, group_cols, seed=seed)
    return hll_estimate(regs, group_cols)


def hll_merge(regs_a: DataFrame, regs_b: DataFrame,
              group_cols: list[str]) -> DataFrame:
    """Merge two register tables (same value recipe + seed): union +
    ``max`` regroup. Equal by law to the sketch of the unioned inputs
    (pinned by test_hll_merge_is_register_max) — THE incremental-profile
    primitive: yesterday's persisted registers + today's batch, no
    rescan of yesterday."""
    return (regs_a.union(regs_b)
            .groupBy(*group_cols, "bucket")
            .agg(F.max("m_reg").cast("int").alias("m_reg")))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """The estimate pass over a (possibly merged / re-read) register
    table — see :func:`hll_distinct` for the output contract."""
    term = _pow2_at(F.lit(HLL_RHO_MAX) - F.col("m_reg"), HLL_RHO_MAX + 1)
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets"),
        F.sum(term).cast("long").alias("s_nonempty"),
    )
    zeros = F.lit(HLL_M) - F.col("n_buckets")
    s_scaled = (
        F.col("s_nonempty")
        + zeros.cast("long") * F.lit(1 << HLL_RHO_MAX).cast("long")
    )
    e_raw = F.lit(float(HLL_ALPHA_MM)) * F.lit(float(1 << HLL_RHO_MAX)) / s_scaled
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when((e_raw <= 2.5 * HLL_M) & (zeros > 0), lin).otherwise(e_raw)
    return per_group.select(
        *group_cols,
        "n_buckets",
        s_scaled.alias("s_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_set_estimates(
    regs_a: DataFrame,
    regs_b: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Distinct-count estimates for the UNION and INTERSECTION of two
    sketched sets (same value recipe + seed), per group: union is exact
    at the sketch level (register max — :func:`hll_merge`); intersection
    is inclusion–exclusion ``|A| + |B| - |A∪B|``, clamped at 0 (the
    standard HLL approach; error grows as the true intersection shrinks
    relative to the union — callers wanting tight small-intersection
    estimates need a different sketch family, documented here rather
    than papered over). Output: ``(group…, est_a, est_b, est_union,
    est_intersection)``."""
    a = hll_estimate(regs_a, group_cols).select(
        *group_cols, F.col("est_distinct").alias("est_a"))
    b = hll_estimate(regs_b, group_cols).select(
        *group_cols, F.col("est_distinct").alias("est_b"))
    u = hll_estimate(hll_merge(regs_a, regs_b, group_cols),
                     group_cols).select(
        *group_cols, F.col("est_distinct").alias("est_union"))
    inter = F.greatest(
        F.lit(0.0),
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4))
    return (a.join(b, group_cols).join(u, group_cols)
            .withColumn("est_intersection", inter))


# --- Bloom filter ----------------------------------------------------------

BLOOM_LANE_BITS = 32  # bits per BIGINT word; bit 63 never set (DuckDB-safe)


def _bloom_pos(value: Column, i: int, m_bits: int, seed: str) -> Column:
    """Hash position i ∈ [0, k): 16 md5 bits (hex digits 1-4) of
    ``md5(value ':' seed ':' i)`` mod ``m_bits``."""
    h = F.md5(F.concat(value.cast("string"), F.lit(f":{seed}:{i}")))
    return _hex_int(h, 1, 4) % m_bits


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 2048,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Build the Bloom bitset as a TABLE of ``(word int, bits bigint)``
    with 32 bits per word — ≤ ``m_bits/32`` rows total. Merge operator is
    ``bit_or`` regroup, so per-partition partial bitsets combine
    map-side; the full build is one bounded-key shuffle no matter how
    many values stream in.

    k positions per value via :func:`_bloom_pos` (16 hash bits each —
    callers keep ``m_bits ≤ 65536``)."""
    if m_bits % BLOOM_LANE_BITS:
        raise ValueError(f"m_bits must be a multiple of {BLOOM_LANE_BITS}")
    if m_bits > 65536:
        raise ValueError("m_bits > 65536 exceeds the 16-bit position hash")
    v = F.col(value_col)
    pos = F.explode(
        F.array(*[_bloom_pos(v, i, m_bits, seed) for i in range(k)])
    ).alias("pos")
    rows = df.filter(v.isNotNull()).select(pos)
    word = (F.col("pos") / BLOOM_LANE_BITS).cast("int").alias("word")
    lane = _pow2_at(F.col("pos") % BLOOM_LANE_BITS, BLOOM_LANE_BITS)
    return (
        rows.select(word, lane.alias("lane"))
        .groupBy("word")
        .agg(F.bit_or("lane").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    words: list[int],
    m_bits: int = 2048,
    k: int = 4,
    seed: str = "bloom",
    out_col: str = "bloom_member",
) -> DataFrame:
    """Zero-shuffle membership probe: the built bitset arrives as a
    LITERAL dense word array (``words[j]`` = bits of word j, 0 for empty
    — :func:`bloom_words`), folded into the projection like
    decontam's literal bench path — the corpus is scanned exactly once,
    no join, no exchange. A value is a member iff ALL k of its lanes are
    set (one-sided error: false positives only, never false negatives).

    The literal is bounded and documented: ``m_bits/32`` BIGINTs
    (2048 bits → 64 longs) — Bloom's whole point is that this stays tiny
    while representing millions of build values."""
    if len(words) != m_bits // BLOOM_LANE_BITS:
        raise ValueError(
            f"words must have {m_bits // BLOOM_LANE_BITS} entries, "
            f"got {len(words)}")
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    v = F.col(value_col)
    checks = []
    for i in range(k):
        pos = _bloom_pos(v, i, m_bits, seed)
        word_bits = F.element_at(arr, (pos / BLOOM_LANE_BITS).cast("int") + 1)
        lane = _pow2_at(pos % BLOOM_LANE_BITS, BLOOM_LANE_BITS)
        checks.append(word_bits.bitwiseAND(lane) != 0)
    member = checks[0]
    for c in checks[1:]:
        member = member & c
    return df.withColumn(
        out_col, F.when(v.isNull(), F.lit(False)).otherwise(member)
    )


def bloom_probe_join(
    df: DataFrame,
    value_col: str,
    sketch: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    seed: str = "bloom",
    out_col: str = "bloom_member",
) -> DataFrame:
    """Membership probe for filters too big to literal-fold
    (:func:`bloom_probe` collects ``m_bits/32`` words to the driver —
    right for a 2 KB frontier filter, wrong for a 2 GB one): ``k``
    SEQUENTIAL broadcast left-joins of the word table, one per hash
    index, each pinning its lane-set bit as a boolean column — the
    corpus never shuffles and never regroups (an explode-k → groupBy(id)
    formulation would shuffle k× the corpus).  Broadcasting the word
    table k times is the deliberate trade: it is ≤ ``m_bits/32`` rows —
    millions of build keys compress into megabytes, which is Bloom's
    whole point.

    Semantics are identical to :func:`bloom_probe` (pinned by
    test_bloom_probe_join_matches_literal): missing word rows coalesce
    to not-set; NULL values are non-members."""
    if m_bits % BLOOM_LANE_BITS:
        raise ValueError(f"m_bits must be a multiple of {BLOOM_LANE_BITS}")
    v = F.col(value_col)
    out = df
    flags = []
    for i in range(k):
        pos = _bloom_pos(v, i, m_bits, seed)
        w = sketch.select(F.col("word").alias(f"_bw{i}"),
                          F.col("bits").alias(f"_bb{i}"))
        out = out.withColumn(f"_bw{i}",
                             (pos / BLOOM_LANE_BITS).cast("int")) \
                 .withColumn(f"_bp{i}",
                             (pos % BLOOM_LANE_BITS).cast("int"))
        out = out.join(F.broadcast(w), f"_bw{i}", "left")
        lane = _pow2_at(F.col(f"_bp{i}"), BLOOM_LANE_BITS)
        flags.append(F.coalesce(
            F.col(f"_bb{i}").bitwiseAND(lane) != 0, F.lit(False)))
    member = flags[0]
    for fcol in flags[1:]:
        member = member & fcol
    out = out.withColumn(
        out_col, F.when(v.isNull(), F.lit(False)).otherwise(member))
    drop = [c for i in range(k) for c in (f"_bw{i}", f"_bp{i}", f"_bb{i}")]
    return out.drop(*drop)


def bloom_words(sketch: DataFrame, m_bits: int = 2048) -> list[int]:
    """Densify a :func:`bloom_build` sketch into the probe literal:
    a ``m_bits/32``-long python list (missing words → 0). The ONLY
    driver-side collect in this family, bounded by construction at
    ``m_bits/32`` rows (64 for the default geometry)."""
    n_words = m_bits // BLOOM_LANE_BITS
    dense = [0] * n_words
    for row in sketch.collect():  # bounded: ≤ n_words rows
        dense[int(row["word"])] = int(row["bits"])
    return dense


# --- Count-min sketch ------------------------------------------------------

def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch TABLE: ``(row int, col int, cnt bigint)`` —
    ``d·w`` counters total (the sketch state), built with ONE
    bounded-key shuffle (groupBy over ≤ d·w cells, map-side combine).
    Merge = ``sum`` regroup. ``col`` for hash row i is 16 md5 bits of
    ``md5(key ':' seed ':' i)`` mod w."""
    if w > 65536:
        raise ValueError("w > 65536 exceeds the 16-bit position hash")
    key = F.col(key_col)
    wt = (F.col(weight_col).cast("long") if weight_col is not None
          else F.lit(1).cast("long"))
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                (_bloom_pos(key, i, w, seed)).cast("int").alias("col"),
            )
            for i in range(d)
        ])
    ).alias("rc")
    rows = df.filter(key.isNotNull()).select(pairs, wt.alias("wt"))
    return (
        rows.select(F.col("rc.row").alias("row"),
                    F.col("rc.col").alias("col"), "wt")
        .groupBy("row", "col")
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_merge(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Merge two CMS tables built with the same (d, w, seed): union +
    sum regroup — equal by law to the sketch of the concatenated
    streams (pinned by test_cms_overcounts_only_and_merges)."""
    return (sk_a.union(sk_b)
            .groupBy("row", "col").agg(F.sum("cnt").alias("cnt")))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    seed: str = "cms",
    out_col: str = "est_count",
) -> DataFrame:
    """Point-estimate counts for a (small) query-key frame against a
    :func:`cms_build` sketch: est = min over the d rows of the counter at
    that key's cell — never under-counts, over-counts only on hash
    collisions (CM guarantee: ε=e/w overcount at δ=e^-d confidence).

    Plan: explode d cells per query key, broadcast-join the sketch
    (≤ d·w rows, always broadcastable), re-group by key taking ``min``.
    The corpus is NOT touched — only the sketch and the query keys."""
    key = F.col(key_col)
    cells = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                (_bloom_pos(key, i, w, seed)).cast("int").alias("col"),
            )
            for i in range(d)
        ])
    ).alias("rc")
    q = queries.filter(key.isNotNull()).select(
        key.alias(key_col), cells
    ).select(key_col, "rc.row", "rc.col")
    joined = q.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
             .alias(out_col))
    )


# --- fixed-width histogram quantiles ----------------------------------------

def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: float,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Mergeable per-group quantile estimates from a fixed-width
    histogram: bin = ``floor(value/width)``; the per-(group, bin) counts
    are the sketch (merge = ``sum``); the q-quantile estimate is the
    UPPER EDGE ``(bin+1)·width`` of the first bin whose cumulative count
    reaches ``ceil(q·n)`` — error bounded by one bin width, state bounded
    by the value range, all arithmetic integer-or-single-float-op (no
    float accumulation).

    Contrast with the exact `percentiles_price` entry (full sort per
    group): at 10^12 rows the histogram shuffles ≤ |groups|·|bins| cells
    with map-side combine instead of every value. Output:
    ``(group…, n bigint, q50_est, q95_est, q99_est double)`` (column
    names from ``qs`` percents)."""
    binned = histogram_bins(df, value_col, group_cols, width)
    return histogram_quantiles_from_bins(binned, group_cols, width, qs)


def histogram_bins(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: float,
) -> DataFrame:
    """The histogram sketch TABLE ``(group…, bin, c)`` — bin =
    ``floor(value/width)``, merge = ``sum`` regroup
    (:func:`histogram_merge`)."""
    bin_col = F.floor(F.col(value_col) / F.lit(float(width))).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_merge(bins_a: DataFrame, bins_b: DataFrame,
                    group_cols: list[str]) -> DataFrame:
    """Merge two bin tables built with the same width: union + sum."""
    return (bins_a.union(bins_b)
            .groupBy(*group_cols, "bin").agg(F.sum("c").alias("c")))


def histogram_quantiles_from_bins(
    binned: DataFrame,
    group_cols: list[str],
    width: float,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """The quantile pass over a (possibly merged / re-read) bin table —
    see :func:`histogram_quantiles` for the output contract."""
    from pyspark.sql import Window

    wspec = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = binned.select(
        *group_cols,
        "bin",
        F.sum("c").over(wspec).alias("cum"),
        F.sum("c").over(tot).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        need = F.ceil(F.lit(float(q)) * F.col("n"))
        hit_bin = F.min(F.when(F.col("cum") >= need, F.col("bin")))
        name = f"q{int(round(q * 100))}_est"
        aggs.append(((hit_bin + 1) * F.lit(float(width))).alias(name))
    return cum.groupBy(*group_cols).agg(*aggs)


# --- KMV (bottom-k / theta) distinct sketch --------------------------------

# The k-minimum-values sketch (Bar-Yossef et al. 2002; the theta-sketch
# family): keep the k smallest uniform hashes of the distinct values.
# Complements HLL with the one thing HLL fundamentally lacks — UNBIASED
# SET-OPERATION estimates (intersection/difference): the combined bottom-k
# of two sketches is a uniform sample of the union, so membership ratios
# inside it estimate any set expression. Estimator: n̂ = (k-1)/u_(k) with
# u_(k) the k-th smallest hash as a fraction of the hash space; < k
# distinct values → the sketch IS the distinct set (exact count).
KMV_K = 64
KMV_SPACE = float(1 << 32)  # hashes are 8 hex digits = 32 bits


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    seed: str = "kmv",
) -> DataFrame:
    """Per-group bottom-k sketch table: (group…, rnk, hv) with hv the
    rnk-th smallest 32-bit md5 hash over the DISTINCT values — ≤ k rows
    per group regardless of input size.

    100 TB shape: one (group, hv) hash agg with map-side combine dedups
    the hashes; then a two-level bottom-k: a (group, spark_partition_id)
    window — evenly spread across tasks — discards everything that
    cannot reach the global bottom-k, so the final per-group window
    ranks ≤ k·partitions rows. Bounded even for an ungrouped
    (single-group) sketch, where a bare global window would otherwise
    sort every distinct hash in ONE task. The prefilter never changes
    the result: a hash outside its partition's bottom-k is outside the
    group's bottom-k a fortiori."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(value_col).cast("string"), F.lit(f":{seed}")))
    hv = _hex_int(h, 1, 8)
    dedup = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, hv.alias("hv"))
        .groupBy(*group_cols, "hv").agg(F.lit(1).alias("_one"))
    )
    wloc = Window.partitionBy(*group_cols,
                              F.spark_partition_id()).orderBy("hv")
    pruned = (dedup.select(*group_cols, "hv",
                           F.row_number().over(wloc).alias("_lr"))
              .filter(F.col("_lr") <= k))
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        pruned.select(*group_cols, "hv",
                      F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
        .select(*group_cols, "rnk", "hv")
    )


def kmv_merge(
    sk_a: DataFrame, sk_b: DataFrame, group_cols: list[str], k: int = KMV_K,
) -> DataFrame:
    """Sketch merge: union the hash sets, dedup, re-rank, keep bottom-k.
    Closed under the sketch contract — bottom-k(bottom-k(A) ∪ bottom-k(B))
    = bottom-k(A ∪ B) (pinned by tests), so shard sketches reduce
    pairwise without ever rescanning data."""
    from pyspark.sql import Window

    u = (sk_a.select(*group_cols, "hv")
         .unionByName(sk_b.select(*group_cols, "hv"))
         .groupBy(*group_cols, "hv").agg(F.lit(1).alias("_one")))
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (u.select(*group_cols, "hv", F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= k)
            .select(*group_cols, "rnk", "hv"))


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = KMV_K,
) -> DataFrame:
    """Per-group distinct estimate from the sketch table: exact count
    when the group holds < k hashes (the sketch saw every distinct
    value), else (k-1)·2³²/hv_k rounded to 4 — double math identical in
    both engines, so the estimate hash-gates."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_held"),
        F.max(F.when(F.col("rnk") == k, F.col("hv"))).alias("_hvk"))
    est = F.when(
        F.col("n_held") < k, F.col("n_held").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(KMV_SPACE)
                        / F.col("_hvk"), 4))
    return agg.select(*group_cols, "n_held", est.alias("est_distinct"))


def kmv_set_estimates(
    sk_a: DataFrame, sk_b: DataFrame, k: int = KMV_K,
) -> DataFrame:
    """Union / intersection estimates from two UNGROUPED sketches (single
    logical sets; sketch frames carry just (rnk, hv)).

    Combined bottom-k K of A∪B is a uniform size-k sample of the union;
    ρ = |K ∩ A ∩ B| / k estimates the intersection fraction, so
    n̂∩ = ρ·n̂∪ (the theta-sketch intersection). All joins here are
    sketch-sized (≤ k rows) broadcasts — never data-sized."""
    merged = kmv_merge(sk_a.select(F.lit(1).alias("_g"), "rnk", "hv"),
                       sk_b.select(F.lit(1).alias("_g"), "rnk", "hv"),
                       ["_g"], k)
    in_a = sk_a.select(F.col("hv").alias("hv_a")).distinct()
    in_b = sk_b.select(F.col("hv").alias("hv_b")).distinct()
    both = (
        merged
        .join(F.broadcast(in_a), F.col("hv") == F.col("hv_a"), "left")
        .join(F.broadcast(in_b), F.col("hv") == F.col("hv_b"), "left")
        .agg(
            F.count("*").cast("int").alias("n_held"),
            F.max(F.when(F.col("rnk") == k, F.col("hv"))).alias("_hvk"),
            F.sum(F.when(F.col("hv_a").isNotNull()
                         & F.col("hv_b").isNotNull(), 1)
                  .otherwise(0)).cast("int").alias("n_both"))
    )
    est_union = F.when(
        F.col("n_held") < k, F.col("n_held").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(KMV_SPACE)
                        / F.col("_hvk"), 4))
    # ρ denominator is n_held, not k: when the union has < k distinct
    # hashes K holds ALL of it, so ρ·n̂∪ = (n_both/n_held)·n_held = the
    # exact intersection count; at n_held == k the two coincide
    return both.select(
        "n_held", "n_both",
        est_union.alias("est_union"),
        F.round(F.col("n_both") / F.col("n_held") * est_union, 4)
        .alias("est_intersection"))
