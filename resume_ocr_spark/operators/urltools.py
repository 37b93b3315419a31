"""URL / domain operators for crawl curation.

The domain-level pass every web-corpus pipeline runs before content
filtering (RefinedWeb/FineWeb run UT1-style blocklists, per-domain
quotas and domain-level stats ahead of the text stages; the reference
app has no crawl surface — this family extends SURVEY §2.7's curation
inventory to the URL axis).

Three operators, all designed for the 100 TB shapes:

  with_url_parts          — scheme/host/registered-domain/path as pure
                            Column regex+array ops: zero shuffles, zero
                            Python, stays inside whole-stage codegen
  filter_blocked_domains  — broadcast ANTI join against a blocklist
                            (blocklists are dimension-sized: UT1 is
                            ~4M rows — broadcastable; the corpus never
                            shuffles)
  domain_stats            — per-domain counts/chars (one hash shuffle,
                            map-side combine); feeds per-domain quota
                            decisions (mixture.stratified_topk)

Registered-domain (eTLD+1) uses an explicit two-level-suffix SET rather
than the full Public Suffix List (not shippable inside an expression;
callers with the real PSL should pass their own ``two_level_suffixes``).
Every expression is dialect-neutral so the DuckDB oracle can mirror it
(RE2/Java regex subset: no backrefs, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the high-traffic two-level public suffixes; PSL-complete callers
# override. Kept sorted + lowercase: membership is exact-string.
DEFAULT_TWO_LEVEL_SUFFIXES = (
    "ac.uk", "co.jp", "co.kr", "co.nz", "co.uk", "co.za", "com.au",
    "com.br", "com.cn", "com.mx", "com.tr", "gov.uk", "ne.jp", "net.au",
    "or.jp", "org.uk",
)

# scheme matching is case-insensitive per RFC 3986 (crawls carry
# 'HTTP://' URLs); the char class spells both cases out rather than
# lowercasing the whole URL because PATHS are case-sensitive
_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*):"
_AUTH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_HOST_RE = "^(?:[^@]*@)?([^:]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def host_expr(url) -> "F.Column":
    """Host of a URL as a pure Column expression: lowercased, userinfo
    and port stripped, trailing root dot removed (``example.com.`` →
    ``example.com``). Unparseable input yields empty string."""
    u = F.coalesce(url, F.lit(""))
    return F.regexp_replace(
        F.lower(F.regexp_extract(
            F.regexp_extract(u, _AUTH_RE, 1), _HOST_RE, 1)),
        "[.]+$", "")


def registered_domain_expr(
    host,
    two_level_suffixes: tuple[str, ...] = DEFAULT_TWO_LEVEL_SUFFIXES,
) -> "F.Column":
    """Registered domain (eTLD+1) of a host Column — the last two labels,
    or three when the last two are a known two-level public suffix; a
    single-label host (``localhost``) is its own domain. Pure Column
    ops; shared by :func:`with_url_parts` and `linkgraph`.

    Implemented as two anchored regexp_extracts (last-2 / last-3 labels)
    rather than split/slice/array_join: the array form inlined ~6 copies
    of split() per use and pushed the whole-stage-codegen method past
    janino's 64 KB limit when composed with `linkgraph`'s resolution CASE
    (measured: ERROR CodeGenerator → interpreter fallback). The regex
    form keeps the stage inside codegen; hosts with empty labels
    (``a..b``) have no well-formed last-2 match and degrade to the full
    host, which is also what the blocklist/graph consumer wants."""
    last2 = F.regexp_extract(host, "([^.]+[.][^.]+)$", 1)
    last3 = F.regexp_extract(host, "([^.]+[.][^.]+[.][^.]+)$", 1)
    suffix_set = F.array(*[F.lit(s) for s in two_level_suffixes])
    return (
        F.when(last2 == "", host)  # 0/1-label host is its own domain
        .when(F.array_contains(suffix_set, last2) & (last3 != ""), last3)
        .otherwise(last2)
    )


def with_url_parts(
    df: DataFrame,
    url_col: str = "url",
    two_level_suffixes: tuple[str, ...] = DEFAULT_TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Add ``scheme``, ``host``, ``domain`` (registered domain /
    eTLD+1), ``path`` parsed from ``url_col``.

    Pure Column ops (regexp_extract + array slicing) — no shuffle, no
    Python, whole-stage-codegen-friendly, and expressible 1:1 in the
    DuckDB oracle (unlike Spark's ``parse_url``, which DuckDB lacks).
    Hosts are lowercased and a trailing root dot (legal FQDN form
    ``example.com.``) is stripped so eTLD+1 and blocklist matching see
    the canonical name; userinfo and port are stripped.  A host with a
    single label (``localhost``) is its own domain; unparseable URLs
    yield empty strings, never nulls/errors (error-as-data totality)."""
    url = F.coalesce(F.col(url_col), F.lit(""))
    out = (
        df.withColumn("scheme", F.lower(F.regexp_extract(url, _SCHEME_RE, 1)))
        .withColumn("host", host_expr(F.col(url_col)))
        .withColumn("path", F.regexp_extract(url, _PATH_RE, 1))
    )
    return out.withColumn(
        "domain", registered_domain_expr(F.col("host"), two_level_suffixes))


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop rows whose ``domain_col`` appears in ``blocked`` (a
    one-column DataFrame of domains, e.g. a UT1 category list).

    Broadcast ANTI join: the blocklist is dimension-sized, the corpus
    side never shuffles.  ``keep_blocked=True`` inverts to a SEMI join
    (audit mode: what WOULD be dropped).  BOTH sides are lowercased in
    the comparison — callers may pass domains that did not come through
    :func:`with_url_parts`."""
    bcol = blocked.columns[0]
    # no .distinct() on the list: SEMI/ANTI joins are set-semantics on
    # the probe side already, and the dedup would cost the only exchange
    # in the whole operator
    right = F.broadcast(
        blocked.select(F.lower(F.col(bcol)).alias("_blocked_domain")))
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(
        right, F.lower(F.col(domain_col)) == F.col("_blocked_domain"), how)


def domain_stats(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str | None = "text",
) -> DataFrame:
    """Per-domain ``(n_docs, n_chars)`` — the fan-in a per-domain quota
    or a domain-quality prior consumes.  One hash shuffle with map-side
    partial aggregation; output cardinality = distinct domains."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if text_col is not None:
        aggs.append(
            F.sum(F.length(F.coalesce(F.col(text_col), F.lit(""))))
            .alias("n_chars"))
    return df.groupBy(F.col(domain_col).alias("domain")).agg(*aggs)


def keep_latest_capture(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    tie_col: str = "doc_id",
) -> DataFrame:
    """CDX-style capture dedup: keep ONE row per URL — the newest capture.

    A crawl archive holds every historical fetch of a URL (CommonCrawl's
    CDX index exists to answer exactly this "which capture is current?"
    question); a training corpus wants one.  The keeper is the row with
    the lexicographically largest ``(ts_col, tie_col)`` pair — newest
    fetch, ties (same-second refetches, mirrored records) broken by the
    larger ``tie_col`` so the result is deterministic across engines,
    task retries, and cluster sizes.

    Distributed shape: ``max_by`` over a struct ordering key — ONE hash
    shuffle on ``url`` with MAP-SIDE partial aggregation, so at most one
    candidate row per URL per input partition crosses the wire.  This
    deliberately beats the textbook ``row_number() OVER (PARTITION BY
    url)`` window, which must shuffle EVERY capture row (a hot URL with
    10^5 captures ships all of them to one task); with ``max_by`` the
    same hot URL contributes one row per upstream partition.  Input
    schema is preserved (column order included).
    """
    cols = df.columns
    packed = df.groupBy(F.col(url_col).alias("_url")).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in cols]),
            F.struct(F.col(ts_col), F.col(tie_col)),
        ).alias("_keep"))
    return packed.select(*[F.col(f"_keep.{c}").alias(c) for c in cols])
