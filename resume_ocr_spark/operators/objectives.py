"""Training-objective example transforms: FIM (fill-in-the-middle)
document restructuring and T5-style span corruption.

Both are the last hop of a pretraining data pipeline — after curation /
packing, each document is rewritten into the objective's input format
(Bavarian et al. 2022 "Efficient Training of Language Models to Fill in
the Middle"; Raffel et al. 2020 T5 span corruption). At 100 TB this hop
must be a pure projection: both operators here are zero-shuffle per-row
Column programs (split → arithmetic on word positions → array rebuild),
so they pipeline into whatever scan precedes them and add no exchange.

Determinism contract (same as :mod:`.mixture` / :func:`.packing.epoch_shuffle`):
every random choice — whether a doc is FIM-ed, where the prefix/middle/
suffix cuts fall, which word spans are masked — derives from md5 of the
document id + a caller seed, NOT from a seeded ``rand()``. That makes the
transform reproducible across engines, repartitions, task retries and
cluster sizes, lets an incremental run extend a corpus without re-drawing
old docs, and lets a DuckDB oracle replay the exact output for the gate.

Word convention matches :func:`.packing.chunk_documents`: Java's ASCII
``\\s`` split (mirrors DuckDB RE2), whitespace-only/NULL text counts 0
words, output text is single-space renormalized (transforms are
word-indexed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mixture import BUCKETS, with_sample_bucket

#: FIM sentinel tokens (PSM serialization: prefix, suffix, then the middle
#: the model must produce)
FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"


def _words(text_col: str):
    """ASCII-whitespace word array; '' → [] (split would yield [''])."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, "\\s+"))


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.5,
    min_words: int = 8,
    seed: str = "fim",
) -> DataFrame:
    """Rewrite a ``rate`` fraction of documents into FIM/PSM form:
    ``<PRE> prefix <SUF> suffix <MID> middle`` — the model learns to
    infill ``middle`` given both sides. Untransformed docs pass through
    (the FIM paper's joint objective trains on a mixture, not 100%).

    Per-doc draws, all md5-derived (see module docstring):
      * apply iff low-16-bits(md5(id ':' seed)) < floor(rate·65536)
        AND the doc has ≥ ``min_words`` words (degenerate splits are
        skipped, not clamped);
      * cut1 ∈ [1, nw-2] and cut2 ∈ [cut1+1, nw-1] from two independent
        16-bit md5 fields — prefix/middle/suffix all non-empty.

    Output: ``(id_col, fim_applied, n_words, cut1, cut2, fim_text)`` with
    NULL cuts on pass-through rows; ``fim_text`` is the PSM string or the
    renormalized original. Zero shuffles — a pure projection at any scale.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate out of [0,1]: {rate}")
    if min_words < 3:
        raise ValueError("min_words must be >= 3 (three non-empty parts)")
    cut_lim = int(rate * BUCKETS)
    ids = F.col(id_col).cast("string")
    hcut = F.md5(F.concat(ids, F.lit(f":{seed}:cut")))
    a = F.conv(F.substring(hcut, 1, 4), 16, 10).cast("long")
    b = F.conv(F.substring(hcut, 5, 4), 16, 10).cast("long")

    # the apply/skip gate is mixture's 16-bit sampling bucket (one source
    # of truth for that hash recipe); the cut draws use the high md5
    # fields of an independent ':cut' key
    base = with_sample_bucket(df, id_col, seed, out_col="_g").select(
        F.col(id_col), _words(text_col).alias("_w"),
        F.col("_g"), a.alias("_a"), b.alias("_b"),
    ).select(
        id_col, "_w", "_a", "_b",
        F.size("_w").cast("bigint").alias("n_words"),
        ((F.col("_g") < F.lit(cut_lim))
         & (F.size("_w") >= F.lit(min_words))).alias("fim_applied"),
    )
    cut1 = F.lit(1) + F.pmod(F.col("_a"), F.col("n_words") - 2)
    cut2 = F.col("cut1") + 1 + F.pmod(
        F.col("_b"), F.col("n_words") - 1 - F.col("cut1"))
    with_cuts = base.withColumn(
        "cut1", F.when(F.col("fim_applied"), cut1).cast("bigint")
    ).withColumn(
        "cut2", F.when(F.col("fim_applied"), cut2).cast("bigint")
    )
    prefix = F.array_join(F.slice(F.col("_w"), F.lit(1), F.col("cut1")), " ")
    middle = F.array_join(
        F.expr("slice(_w, CAST(cut1 + 1 AS INT), CAST(cut2 - cut1 AS INT))"),
        " ")
    suffix = F.array_join(
        F.expr("slice(_w, CAST(cut2 + 1 AS INT),"
               " CAST(n_words - cut2 AS INT))"), " ")
    fim_text = F.when(
        F.col("fim_applied"),
        F.concat(F.lit(FIM_PRE + " "), prefix, F.lit(" " + FIM_SUF + " "),
                 suffix, F.lit(" " + FIM_MID + " "), middle),
    ).otherwise(F.array_join(F.col("_w"), " "))
    return with_cuts.select(
        id_col, "fim_applied", "n_words", "cut1", "cut2",
        fim_text.alias("fim_text"),
    )


def fim_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.5,
    min_words: int = 8,
    seed: str = "fim",
) -> str:
    """DuckDB mirror of :func:`fim_transform` (same md5 fields, 1-based
    list slices). Generated next to the operator so the two evolve
    together — the gate entry just calls this."""
    cut_lim = int(rate * BUCKETS)
    d = "(instr('0123456789abcdef', substring({h}, {p}, 1)) - 1)"

    def hex16(h: str, start: int) -> str:
        return " + ".join(
            f"{d.format(h=h, p=start + i)} * {16 ** (3 - i)}"
            for i in range(4))

    return f"""
      WITH w AS (
        SELECT {id_col},
               CASE WHEN trim(COALESCE({text_col}, '')) = '' THEN []
                    ELSE regexp_split_to_array(
                           trim(COALESCE({text_col}, '')), '\\s+') END AS wl,
               md5(CAST({id_col} AS VARCHAR) || ':{seed}') AS hg,
               md5(CAST({id_col} AS VARCHAR) || ':{seed}:cut') AS hc
        FROM {table}
      ), g AS (
        SELECT {id_col}, wl, CAST(len(wl) AS BIGINT) AS n_words,
               ({hex16('hg', 29)}) < {cut_lim}
                 AND len(wl) >= {min_words} AS fim_applied,
               ({hex16('hc', 1)}) AS a, ({hex16('hc', 5)}) AS b
        FROM w
      ), c AS (
        SELECT {id_col}, wl, n_words, fim_applied, b,
               CASE WHEN fim_applied
                    THEN CAST(1 + a % (n_words - 2) AS BIGINT) END AS cut1
        FROM g
      ), c2 AS (
        SELECT {id_col}, wl, n_words, fim_applied, cut1,
               CASE WHEN fim_applied
                    THEN CAST(cut1 + 1 + b % (n_words - 1 - cut1)
                              AS BIGINT) END AS cut2
        FROM c
      )
      SELECT {id_col}, fim_applied, n_words, cut1, cut2,
             CASE WHEN fim_applied THEN
               '{FIM_PRE} ' || array_to_string(wl[1:CAST(cut1 AS INT)], ' ')
               || ' {FIM_SUF} '
               || array_to_string(wl[CAST(cut2 + 1 AS INT):], ' ')
               || ' {FIM_MID} '
               || array_to_string(
                    wl[CAST(cut1 + 1 AS INT):CAST(cut2 AS INT)], ' ')
             ELSE array_to_string(wl, ' ') END AS fim_text
      FROM c2
    """


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int = 16,
    span_len: int = 3,
    seed: str = "t5",
) -> DataFrame:
    """T5-style span corruption: mask periodic word spans, emit the
    corrupted input (spans replaced by ``<X_k>`` sentinels, k consecutive
    from 0) and the target (each sentinel followed by the words it hides,
    closed by a final ``<X_n>`` terminator — Raffel et al. §3.1.4).

    The mask is position arithmetic, not a per-word random draw: with a
    per-doc md5 phase ``o ∈ [0, stride)``, word ``p`` is masked iff
    ``(p + o) % stride < span_len`` — an expected ``span_len/stride``
    corruption rate (default 3/16 ≈ T5's 15%) with exact span lengths,
    deterministic and engine-replayable, and O(1) per word (no
    gaps-and-islands pass to find run starts: a run starts where the
    previous position is unmasked).

    Output: ``(id_col, n_words, phase, n_masked, n_spans, corrupted,
    target)``. Zero shuffles — pure projection."""
    if not 0 < span_len < stride:
        raise ValueError("need 0 < span_len < stride")
    ids = F.col(id_col).cast("string")
    phase = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(ids, F.lit(f":{seed}:off"))), 1, 4), 16, 10)
        .cast("long"),
        F.lit(stride))
    base = df.select(
        F.col(id_col), _words(text_col).alias("_w"), phase.alias("phase"),
    ).withColumn("n_words", F.size("_w").cast("bigint"))
    # k_base: run_id of the document's first mask run (0 if position 0 is
    # mid-run, else 1) so sentinel ids start at 0
    masked = f"(p + phase) % {stride} < {span_len}"
    prev_unmasked = f"(p = 0 OR (p - 1 + phase) % {stride} >= {span_len})"
    k = (f"CAST((p + phase) div {stride}"
         f" - (CASE WHEN phase < {span_len} THEN 0 ELSE 1 END) AS STRING)")
    seq = "sequence(0, CAST(n_words AS INT) - 1)"
    corrupted = F.expr(
        f"array_join(flatten(transform({seq}, p -> CASE"
        f" WHEN NOT ({masked}) THEN array(_w[p])"
        f" WHEN {prev_unmasked} THEN array(concat('<X_', {k}, '>'))"
        f" ELSE array() END)), ' ')")
    target_body = F.expr(
        f"flatten(transform({seq}, p -> CASE"
        f" WHEN ({masked}) AND {prev_unmasked}"
        f"   THEN array(concat('<X_', {k}, '>'), _w[p])"
        f" WHEN {masked} THEN array(_w[p])"
        f" ELSE array() END))")
    n_masked = F.expr(
        f"CAST(size(filter({seq}, p -> {masked})) AS BIGINT)")
    n_spans = F.expr(
        f"CAST(size(filter({seq}, p -> ({masked}) AND {prev_unmasked}))"
        f" AS BIGINT)")
    out = base.withColumn("n_masked", n_masked) \
              .withColumn("n_spans", n_spans)
    target = F.when(F.col("n_words") == 0, F.lit("")).otherwise(
        F.array_join(
            F.concat(target_body,
                     F.array(F.concat(F.lit("<X_"),
                                      F.col("n_spans").cast("string"),
                                      F.lit(">")))), " "))
    return out.select(
        id_col, "n_words", "phase", "n_masked", "n_spans",
        F.when(F.col("n_words") == 0, F.lit(""))
         .otherwise(corrupted).alias("corrupted"),
        target.alias("target"),
    )


def span_corrupt_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int = 16,
    span_len: int = 3,
    seed: str = "t5",
) -> str:
    """DuckDB mirror of :func:`span_corrupt` (1-based ``wl[p+1]``,
    ``range(0, n)`` for the 0-based position walk)."""
    d = "(instr('0123456789abcdef', substring(h, {p}, 1)) - 1)"
    hex16 = " + ".join(
        f"{d.format(p=1 + i)} * {16 ** (3 - i)}" for i in range(4))
    masked = f"(p + phase) % {stride} < {span_len}"
    prev_unmasked = f"(p = 0 OR (p - 1 + phase) % {stride} >= {span_len})"
    k = (f"CAST((p + phase) // {stride}"
         f" - (CASE WHEN phase < {span_len} THEN 0 ELSE 1 END) AS VARCHAR)")
    seq = "range(0, CAST(n_words AS INT))"
    return f"""
      WITH w AS (
        SELECT {id_col},
               CASE WHEN trim(COALESCE({text_col}, '')) = '' THEN []
                    ELSE regexp_split_to_array(
                           trim(COALESCE({text_col}, '')), '\\s+') END AS wl,
               md5(CAST({id_col} AS VARCHAR) || ':{seed}:off') AS h
        FROM {table}
      ), g AS (
        SELECT {id_col}, wl, CAST(len(wl) AS BIGINT) AS n_words,
               CAST(({hex16}) % {stride} AS BIGINT) AS phase
        FROM w
      ), m AS (
        SELECT {id_col}, wl, n_words, phase,
               CAST(len(list_filter({seq}, p -> {masked}))
                    AS BIGINT) AS n_masked,
               CAST(len(list_filter({seq},
                    p -> ({masked}) AND {prev_unmasked}))
                    AS BIGINT) AS n_spans
        FROM g
      )
      SELECT {id_col}, n_words, phase, n_masked, n_spans,
             CASE WHEN n_words = 0 THEN '' ELSE
               array_to_string(flatten(list_transform({seq}, p -> CASE
                 WHEN NOT ({masked}) THEN [wl[p + 1]]
                 WHEN {prev_unmasked} THEN ['<X_' || {k} || '>']
                 ELSE [] END)), ' ') END AS corrupted,
             CASE WHEN n_words = 0 THEN '' ELSE
               array_to_string(flatten(list_transform({seq}, p -> CASE
                 WHEN ({masked}) AND {prev_unmasked}
                   THEN ['<X_' || {k} || '>', wl[p + 1]]
                 WHEN {masked} THEN [wl[p + 1]]
                 ELSE [] END))
                 || ['<X_' || CAST(n_spans AS VARCHAR) || '>'], ' ')
             END AS target
      FROM m
    """
