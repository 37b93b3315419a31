"""URL / domain operators for crawl curation.

The domain-level pass every web-corpus pipeline runs before content
filtering (RefinedWeb/FineWeb run UT1-style blocklists, per-domain
quotas and domain-level stats ahead of the text stages; the reference
app has no crawl surface — this family extends SURVEY §2.7's curation
inventory to the URL axis).

The family, all designed for the 100 TB shapes:

  with_url_parts          — scheme/host/registered-domain/path as pure
                            Column regex+array ops: zero shuffles, zero
                            Python, stays inside whole-stage codegen
  with_canonical_url      — RFC 3986 canonical form + tracking-param
                            strip + query sort (the frontier dedup key)
  filter_blocked_domains  — broadcast ANTI join against a blocklist
                            (blocklists are dimension-sized: UT1 is
                            ~4M rows — broadcastable; the corpus never
                            shuffles)
  domain_stats            — per-domain counts/chars (one hash shuffle,
                            map-side combine); feeds per-domain quota
                            decisions (mixture.stratified_topk)
  with_robots_directives  — <meta name=robots> noindex/nofollow gate
  parse_robots /          — RFC 9309 robots.txt interpreter + corpus
  filter_robots_allowed     gate (rules broadcast or SMJ by host)
  sitemap_entries         — <urlset>/<sitemapindex> URL discovery
  feed_entries            — RSS/Atom feed-entry discovery (rel-aware)
  snapshot_delta          — incremental-crawl manifest diff (SMJ)
  keep_latest_capture     — CDX-style newest-capture dedup (max_by)

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


# robots-meta parsing: tag scan is case-insensitive ((?i) — crawls carry
# <META NAME=ROBOTS>), attribute ORDER-FREE (name= and content= are
# matched independently within the tag, so content-before-name parses),
# and quote-tolerant (double, single, or unquoted attribute values).
_META_TAG_RE = "(?i)<meta\\b[^>]*>"
# the name value must END at robots: closing quote, whitespace, '/'
# (self-closing tag) or '>' — a character class, not \b, because \b
# treats '-' as a boundary and would false-match name="robots-extra",
# and RE2 (the DuckDB oracle dialect) has no lookahead to express it
_ROBOTS_NAME_RE = "(?i)name\\s*=\\s*[\"']?robots[\"'\\s/>]"
_CONTENT_QUOTED_RE = "(?i)content\\s*=\\s*[\"']([^\"']*)[\"']"
_CONTENT_BARE_RE = "(?i)content\\s*=\\s*([^\\s\"'>]+)"
# directive token split: robots content is comma-separated per the de
# facto standard, but real pages carry space-only separators too
_DIRECTIVE_SPLIT_RE = "[,\\s]+"


def _robots_content_expr(tag) -> "F.Column":
    """content= attribute value of one <meta> tag Column: quoted form
    first, bare-token fallback (``content=noindex``). Missing → ''."""
    quoted = F.regexp_extract(tag, _CONTENT_QUOTED_RE, 1)
    bare = F.regexp_extract(tag, _CONTENT_BARE_RE, 1)
    return F.lower(F.when(quoted != "", quoted).otherwise(bare))


def with_robots_directives(
    df: DataFrame,
    html_col: str = "html",
    header_col: str | None = None,
) -> DataFrame:
    """Add ``robots_noindex`` / ``robots_nofollow`` booleans parsed from
    ``<meta name=robots>`` tags (and optionally an X-Robots-Tag HTTP
    header column) — the exclusion signal a crawl corpus is OBLIGATED to
    honor before training inclusion (REP meta extension; C4 and the
    CommonCrawl-derived corpora all gate on it).

    Semantics: a page is noindex when ANY robots meta tag (or the
    header) carries the token ``noindex`` or ``none`` in its content
    list; nofollow likewise via ``nofollow``/``none``. Most-restrictive
    wins across conflicting tags (the Google-documented rule), which
    falls out of the any-tag disjunction. Tags whose ``name`` is not
    ``robots`` (``description``, ``googlebot-news``) never match — the
    name check is its own regex, so attribute order in the tag is free.

    Distributed shape: pure Column ops (regexp_extract_all → filter →
    transform → flatten → arrays_overlap) — ZERO shuffles, zero Python,
    one whole-stage-codegen projection over the page scan, and every
    regex is in the RE2∩Java subset so the DuckDB oracle mirrors it
    1:1. At 100 TB this fuses into the same scan as the HTML main-
    content extraction; the gate is free.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    tags = F.regexp_extract_all(html, F.lit(_META_TAG_RE), 0)
    robots = F.filter(tags, lambda t: t.rlike(_ROBOTS_NAME_RE))
    tokens = F.flatten(F.transform(
        robots,
        lambda t: F.split(_robots_content_expr(t), _DIRECTIVE_SPLIT_RE)))
    if header_col is not None:
        hdr = F.lower(F.coalesce(F.col(header_col), F.lit("")))
        tokens = F.concat(tokens, F.split(hdr, _DIRECTIVE_SPLIT_RE))
    noindex = F.arrays_overlap(tokens, F.array(F.lit("noindex"), F.lit("none")))
    nofollow = F.arrays_overlap(tokens, F.array(F.lit("nofollow"), F.lit("none")))
    return (df.withColumn("robots_noindex", noindex)
              .withColumn("robots_nofollow", nofollow))


# sitemap XML shapes (sitemaps.org protocol): <url>/<sitemap> entry
# blocks, each with a required <loc> and optional metadata children.
# (?is) = case-insensitive + DOTALL (entries span lines); non-greedy
# block bodies; all in the RE2∩Java subset for the DuckDB oracle.
_SITEMAP_URL_BLOCK_RE = "(?is)<url\\s*>.*?</url\\s*>"
_SITEMAP_IDX_BLOCK_RE = "(?is)<sitemap\\s*>.*?</sitemap\\s*>"
_SITEMAP_LOC_RE = "(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>"
_SITEMAP_LASTMOD_RE = "(?is)<lastmod\\s*>\\s*(.*?)\\s*</lastmod\\s*>"
_SITEMAP_PRIORITY_RE = "(?is)<priority\\s*>\\s*(.*?)\\s*</priority\\s*>"


def _xml_unescape_expr(s) -> "F.Column":
    """Decode the five predefined XML entities (sitemap <loc> values
    are XML-escaped per the protocol). &amp; LAST so freshly produced
    ampersands are not re-decoded (&amp;lt; means literal '&lt;')."""
    out = s
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Explode sitemap XML bodies into one row per entry — the URL
    discovery surface beside robots.txt (robots.txt's ``Sitemap:`` line
    points here; a refresh pipeline diffs these against the crawl
    frontier). Handles both document kinds: ``<urlset>`` pages
    (``kind='url'``) and ``<sitemapindex>`` children
    (``kind='sitemap'`` — the 50k-entry fan-out shards real sites
    publish), in one pass.

    Emits ``loc`` (XML entities decoded), ``lastmod`` and ``priority``
    (strings as published, empty when absent — W3C datetime parsing is
    the caller's policy), ``kind``. Entries without a ``<loc>`` are
    dropped (the protocol's required child).

    Distributed shape: pure Column ops — two regexp_extract_all block
    scans, per-block child extraction inside ``transform`` lambdas, one
    explode — ZERO shuffles, zero Python, whole-stage codegen, RE2∩Java
    regexes so the DuckDB oracle mirrors 1:1. Input rows keep their
    other columns (the explode multiplies them per entry)."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))

    def entry_structs(block_re: str, kind: str):
        blocks = F.regexp_extract_all(xml, F.lit(block_re), 0)
        return F.transform(
            blocks,
            lambda b: F.struct(
                _xml_unescape_expr(
                    F.regexp_extract(b, _SITEMAP_LOC_RE, 1)).alias("loc"),
                F.regexp_extract(b, _SITEMAP_LASTMOD_RE, 1).alias("lastmod"),
                F.regexp_extract(b, _SITEMAP_PRIORITY_RE, 1)
                .alias("priority"),
                F.lit(kind).alias("kind")))

    entries = F.concat(entry_structs(_SITEMAP_URL_BLOCK_RE, "url"),
                       entry_structs(_SITEMAP_IDX_BLOCK_RE, "sitemap"))
    out = df.withColumn("_e", F.explode(entries))
    out = out.select(
        *[c for c in df.columns if c != xml_col],
        F.col("_e.loc").alias("loc"),
        F.col("_e.lastmod").alias("lastmod"),
        F.col("_e.priority").alias("priority"),
        F.col("_e.kind").alias("kind"))
    return out.filter(F.col("loc") != "")


# robots.txt line shapes (RFC 9309 §2.1): "directive: value" with
# optional comment tail; directives are case-insensitive
_ROBOTS_DIRECTIVE_RE = "^([A-Za-z-]+)\\s*:"
_ROBOTS_VALUE_RE = "^[A-Za-z-]+\\s*:\\s*([^\\s#]*)"
# regex metacharacters to escape when translating a rule path to a
# match pattern — '*' deliberately EXCLUDED (it translates to '.*')
_RULE_ESCAPE_RE = "([.+?^$(){}\\[\\]|\\\\])"


def _rule_pattern_expr(value) -> "F.Column":
    """Translate a robots.txt rule path Column to an anchored regex:
    '*' → '.*', a TRAILING '$' → end anchor (a '$' elsewhere is
    literal, per the Google REP spec), everything else escaped."""
    ends_dollar = value.endswith("$")
    body = F.when(ends_dollar,
                  F.substring(value, 1, F.length(value) - 1)
                  ).otherwise(value)
    esc = F.regexp_replace(body, _RULE_ESCAPE_RE, "\\\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), wild,
                    F.when(ends_dollar, F.lit("$")).otherwise(F.lit("")))


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse per-host robots.txt bodies into the rule set that applies
    to ``agent`` — one output row per host: ``host``, ``rules`` (array
    of ``(pattern, spec, allow)`` structs ready for
    :func:`filter_robots_allowed`).

    RFC 9309 semantics: lines split per host, comments stripped,
    directives case-insensitive; CONSECUTIVE ``User-agent`` lines share
    one group and the group's rules run until the next group header; a
    host that has any group naming ``agent`` exactly (case-insensitive)
    uses ONLY those groups, else the ``*`` groups (the spec's
    most-specific-group rule); empty ``Disallow:`` means unrestricted
    and emits no rule. Rule paths carry Google-REP wildcards: ``*``
    matches any run, a trailing ``$`` anchors the end; ``spec`` is the
    raw rule-path length (the longest-match key).

    A host whose applicable groups survive but carry zero rules (the
    RFC's explicit allow-all, ``Disallow:``) still emits a row with an
    EMPTY rules array — :func:`filter_robots_allowed` distinguishes
    "robots.txt grants everything" from "no robots.txt at all", which
    matters under ``default_allow=False``. A UTF-8 BOM on the first
    line (ubiquitous in real crawls) is stripped before directive
    matching. Duplicate rows for one host are collapsed FIRST (to the
    lexicographically greatest body — deterministic; run
    :func:`keep_latest_capture` upstream if recency should decide)
    because per-row line numbers would otherwise interleave two files'
    groups nondeterministically.

    Distributed shape: the stateful group structure (a rule belongs to
    the preceding User-agent block) is a per-host window — lag() marks
    group starts, a running sum numbers them — then one groupBy folds
    each host's applicable rules into a single array row. ALL shuffles
    here are on the robots side, which is #hosts-sized (dimension-like
    next to the page corpus); the corpus side never appears. Window and
    fold partition on the same host key, so the exchange is reused."""
    from pyspark.sql import Window

    agent_lc = agent.lower()
    one = robots.groupBy(F.col(host_col).alias("host")).agg(
        F.max(F.coalesce(F.col(text_col), F.lit(""))).alias("_txt"))
    lines = one.select(
        "host",
        F.posexplode(F.split(F.col("_txt"), "\n")).alias("ln", "raw"))
    line = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("raw"), "^\\uFEFF", ""), "#.*$", ""))
    parsed = lines.select(
        "host", "ln",
        F.lower(F.regexp_extract(line, _ROBOTS_DIRECTIVE_RE, 1))
        .alias("kind"),
        F.regexp_extract(line, _ROBOTS_VALUE_RE, 1).alias("value"),
    ).filter(F.col("kind").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = F.col("kind") == "user-agent"
    new_group = is_ua & (
        F.coalesce(F.lag("kind").over(w) != "user-agent", F.lit(True)))
    grouped = parsed.withColumn(
        "gid",
        F.sum(new_group.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    wg = Window.partitionBy("host", "gid")
    wh = Window.partitionBy("host")
    ua_val = F.when(is_ua, F.lower(F.col("value")))
    flagged = (grouped
               .withColumn("g_agent",
                           F.max(ua_val == agent_lc).over(wg))
               .withColumn("g_star", F.max(ua_val == "*").over(wg)))
    flagged = flagged.withColumn(
        "h_agent", F.max(F.col("g_agent")).over(wh))
    group_applies = (F.when(F.col("h_agent"), F.col("g_agent"))
                     .otherwise(F.coalesce(F.col("g_star"), F.lit(False))))
    applicable = flagged.filter(
        (~is_ua) & (F.col("value") != "") & group_applies)
    rules = applicable.select(
        "host",
        F.struct(
            _rule_pattern_expr(F.col("value")).alias("pattern"),
            F.length("value").alias("spec"),
            (F.col("kind") == "allow").alias("allow"),
        ).alias("rule"))
    folded = rules.groupBy("host").agg(
        F.collect_list("rule").alias("rules"))
    # a host whose applicable groups carry ZERO rules (explicit
    # allow-all, 'Disallow:') must still emit a row — an EMPTY array —
    # so filter_robots_allowed can tell "robots grants everything"
    # apart from "no robots.txt" (which default_allow governs)
    covered = (flagged.filter(is_ua & group_applies)
               .select("host").distinct())
    empty = F.expr(
        "CAST(array() AS array<struct<pattern:string,spec:int,"
        "allow:boolean>>)")
    return (covered.join(folded, "host", "left")
            .select("host", F.coalesce(F.col("rules"), empty)
                    .alias("rules")))


def filter_robots_allowed(
    df: DataFrame,
    host_rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    default_allow: bool = True,
    keep_denied: bool = False,
    broadcast_rules: bool = False,
    annotate_only: bool = False,
) -> DataFrame:
    """Keep the rows robots.txt permits: join ``df`` to
    :func:`parse_robots` output on host and resolve each path against
    the host's rule array — longest-match wins, ties go to ``allow``
    (the Google-documented tiebreak). A path no rule matches on a host
    that HAS parsed robots data is ALLOWED (the RFC 9309 default);
    ``default_allow`` governs only hosts absent from ``host_rules``
    (no robots.txt seen), so ``default_allow=False`` runs a
    deny-unless-robots-observed policy without denying hosts whose
    robots.txt explicitly grants access.

    Distributed shape: ONE corpus-side shuffle (the host join; pass
    ``broadcast_rules=True`` for a small rules table and it becomes
    zero) — the winner is resolved INSIDE an array expression
    (filter → array_max over (spec, allow) structs, whose lexicographic
    struct ordering IS the spec's precedence), so there is no
    per-(url, rule) explode and no second aggregation shuffle. A hot
    host with 10^6 pages costs exactly its page count; rule arrays are
    tens of entries. ``keep_denied=True`` inverts for audit runs;
    ``annotate_only=True`` skips the filter and keeps every row with
    its ``robots_allowed`` flag."""
    right = host_rules.select(
        F.col("host").alias("_rhost"), F.col("rules").alias("_rules"))
    if broadcast_rules:
        right = F.broadcast(right)
    j = df.join(right, F.col(host_col) == F.col("_rhost"), "left")
    path = F.coalesce(F.col(path_col), F.lit(""))
    matched = F.filter(
        F.col("_rules"), lambda r: F.regexp_like(path, r["pattern"]))
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(r["spec"].alias("spec"),
                                    r["allow"].alias("allow"))))
    # _rules null = host absent from the rules table (no robots.txt) →
    # policy default; _rules present but nothing matched → RFC allow
    allowed = (
        F.when(F.col("_rules").isNull(), F.lit(default_allow))
        .when(F.size(matched) == 0, F.lit(True))
        .otherwise(best["allow"]))
    out = j.withColumn("robots_allowed", allowed).drop("_rhost", "_rules")
    if annotate_only:
        return out
    keep = F.col("robots_allowed") if not keep_denied \
        else ~F.col("robots_allowed")
    return out.filter(keep)


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
    changed_only: bool = False,
) -> DataFrame:
    """Crawl-snapshot delta: classify every URL across two snapshots as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by content
    digest, so an incremental refresh reprocesses ONLY the delta.

    A monthly crawl re-fetches the whole web but most pages are
    byte-identical to last month; re-running extraction + curation over
    the unchanged 95% is the single largest avoidable cost in a
    continuously-refreshed corpus. This operator joins the previous
    snapshot's (key, digest) manifest — two columns, NOT the payload —
    against the new snapshot and emits the new-side rows tagged with
    status; ``changed_only=True`` keeps just ``added``+``changed`` (the
    refresh input set).

    Distributed shape: BOTH snapshots are corpus-sized, so the join is a
    co-partitioned sort-merge join on the key — ``hint("merge")`` on
    both sides pins it (at test scale AQE would broadcast the small side
    and the plan under test would not be the 100 TB plan; same rationale
    as the decontam shuffled-join twin). The old side is projected to
    (key, digest) BEFORE the exchange — the manifest, not the payload,
    crosses the wire. Presence is tracked by explicit marker columns,
    not digest nullability, so null digests classify correctly.

    Output schema: ``key_col``, ``status``, ``old_digest``,
    ``new_digest``, then every remaining new-side column (null for
    ``removed`` rows, which have no new-side payload)."""
    passthrough = [c for c in new.columns if c not in (key_col, digest_col)]
    oside = old.select(
        F.col(key_col).alias(key_col),
        F.col(digest_col).alias("old_digest"),
        F.lit(True).alias("_in_old"))
    nside = new.select(
        F.col(key_col).alias(key_col),
        F.col(digest_col).alias("new_digest"),
        F.lit(True).alias("_in_new"),
        *[F.col(c) for c in passthrough])
    j = nside.hint("merge").join(
        oside.hint("merge"), on=key_col, how="full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_digest").eqNullSafe(F.col("new_digest")),
              F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    out = j.select(
        F.col(key_col), status.alias("status"),
        F.col("old_digest"), F.col("new_digest"),
        *[F.col(c) for c in passthrough])
    if changed_only:
        out = out.filter(F.col("status").isin("added", "changed"))
    return out


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


# feed discovery (RSS 2.0 / Atom 1.0) — the freshness surface beside
# sitemaps: a refresh crawler polls feeds to learn NEW urls cheaply.
# Block/field regexes kept in the RE2 ∩ Java subset for oracle parity.
_RSS_ITEM_RE = r"(?is)<item(?:\s[^>]*)?>.*?</item\s*>"
_ATOM_ENTRY_RE = r"(?is)<entry(?:\s[^>]*)?>.*?</entry\s*>"
_FEED_TITLE_RE = r"(?is)<title(?:\s[^>]*)?>\s*(.*?)\s*</title\s*>"
# opening tag must NOT be self-closing (no '/' before '>'), otherwise a
# lazy body capture starting at '<link .../>' would run across sibling
# elements to an unrelated '</link>' and emit markup garbage as a link
_RSS_LINK_RE = r"(?is)<link(?:\s[^>]*[^/>])?\s*>\s*(.*?)\s*</link\s*>"
# all <link ...> tags, for rel-aware preference (Atom entries carry
# rel=self/replies/edit links BESIDE the article's rel=alternate)
_LINK_TAG_RE = r"(?is)<link\s[^>]*>"
# XML attributes MUST be quoted, but EITHER quote style is valid
# (XML 1.0 §3.1 AttValue) — one pattern per style, no backreference,
# because RE2 (the oracle's engine) has none; linkgraph.py's <a href>
# extraction set the precedent. Double-quote wins inside one tag.
_HREF_IN_TAG_RE = r"(?is)\shref\s*=\s*\"([^\"]*)\""
_HREF_SQ_IN_TAG_RE = r"(?is)\shref\s*=\s*'([^']*)'"
_HREF_ANY_RE = r"(?is)\shref\s*=\s*[\"']"
_REL_ALTERNATE_RE = r"(?is)\srel\s*=\s*[\"']alternate[\"']"
_REL_ANY_RE = r"(?is)\srel\s*="
_RSS_PUBDATE_RE = r"(?is)<pubdate(?:\s[^>]*)?>\s*(.*?)\s*</pubdate\s*>"
_ATOM_UPDATED_RE = r"(?is)<updated(?:\s[^>]*)?>\s*(.*?)\s*</updated\s*>"
_RSS_GUID_RE = r"(?is)<guid(?:\s[^>]*)?>\s*(.*?)\s*</guid\s*>"
_ATOM_ID_RE = r"(?is)<id(?:\s[^>]*)?>\s*(.*?)\s*</id\s*>"
# CDATA unwrap: feeds escape markup-bearing titles as <![CDATA[...]]>
_CDATA_RE = r"(?s)^<!\[CDATA\[(.*)\]\]>$"
# explicit whitespace class for CONTENT cleanup: Java's \s includes
# vertical tab (\x0B), RE2's does not — spelling the class out keeps
# the Spark expression and the DuckDB oracle byte-identical on it
_WS_RUN_RE = "[ \\t\\n\\x0B\\f\\r]+"


def _href_pref_expr(b) -> "F.Column":
    """Best href among a block's ``<link …>`` tags: rel="alternate"
    first (the article URL), then a rel-LESS tag (Atom defaults absent
    rel to alternate), then any href at all. Pure array ops — filter/
    element_at over the extracted tag list — so the DuckDB oracle can
    mirror with list_filter; no lookaround (RE2-compatible)."""
    tags = F.regexp_extract_all(b, F.lit(_LINK_TAG_RE), 0)

    def first_href(arr):
        first = F.get(arr, 0)  # NULL when empty, no guard needed
        dq = F.coalesce(
            F.regexp_extract(first, _HREF_IN_TAG_RE, 1), F.lit(""))
        sq = F.coalesce(
            F.regexp_extract(first, _HREF_SQ_IN_TAG_RE, 1), F.lit(""))
        return F.when(dq != "", dq).otherwise(sq)

    alt = first_href(F.filter(tags, lambda t: t.rlike(_REL_ALTERNATE_RE)))
    norel = first_href(F.filter(tags, lambda t: ~t.rlike(_REL_ANY_RE)))
    anyh = first_href(F.filter(tags, lambda t: t.rlike(_HREF_ANY_RE)))
    return (F.when(alt != "", alt)
            .when(norel != "", norel)
            .otherwise(anyh))


def _feed_text_expr(raw) -> "F.Column":
    """CDATA-unwrap, then XML-entity decode, then whitespace collapse.
    CDATA content is NOT entity-decoded per the XML spec — but feeds in
    the wild double-escape so rarely that the uniform decode is the
    standard aggregator behavior; divergence is bounded to titles that
    literally discuss entities."""
    return F.trim(F.regexp_replace(
        _xml_unescape_expr(F.regexp_replace(raw, _CDATA_RE, "$1")),
        _WS_RUN_RE, " "))


def feed_entries(df: DataFrame, xml_col: str = "feed_xml") -> DataFrame:
    """Explode RSS 2.0 ``<item>`` and Atom ``<entry>`` blocks into one
    row per feed entry: ``(…, pos, kind, title, link, published,
    guid)``.

    - ``kind``: 'rss' | 'atom' per block shape.
    - ``pos``: document order (items first, then entries — a real feed
      carries one kind; order is the feed's recency contract).
    - ``link``: RSS prefers the ``<link>text</link>`` child (self-
      closing ``<link …/>`` tags are NOT text links), falling back to
      an ``href=`` attribute; Atom prefers ``href=`` (its ``<link>``
      is an empty element), falling back to element text. href
      selection is rel-aware: ``rel="alternate"`` first (the article
      URL), then a rel-less tag (Atom's default-alternate), then any
      href — so multi-link entries (rel=self/replies/edit beside
      alternate, the common blog layout) resolve to the article.
      Both XML quote styles (``href="…"`` / ``href='…'``) are
      accepted, double-quote winning within one tag.
    - ``published``: ``<pubDate>`` (RSS) / ``<updated>`` (Atom) as
      published — RFC822/3339 parsing is the caller's policy, same as
      sitemap ``lastmod``.
    - ``guid``: ``<guid>`` / ``<id>``; dedup key for refresh crawls.

    Entries with neither title nor link are dropped (nothing to crawl,
    nothing to read). Distributed shape: sitemap_entries' — two block
    scans, per-block field extraction inside ``transform`` lambdas, one
    posexplode; ZERO shuffles, zero Python, whole-stage codegen.
    """
    xml = F.coalesce(F.col(xml_col), F.lit(""))

    def block_structs(block_re: str, kind: str):
        is_atom = kind == "atom"
        pub = _ATOM_UPDATED_RE if is_atom else _RSS_PUBDATE_RE
        gid = _ATOM_ID_RE if is_atom else _RSS_GUID_RE

        def fields(b):
            text_link = F.regexp_extract(b, _RSS_LINK_RE, 1)
            href = _href_pref_expr(b)
            link1, link2 = (href, text_link) if is_atom \
                else (text_link, href)
            return F.struct(
                F.lit(kind).alias("kind"),
                _feed_text_expr(
                    F.regexp_extract(b, _FEED_TITLE_RE, 1)).alias("title"),
                _xml_unescape_expr(
                    F.when(link1 != "", link1).otherwise(link2))
                .alias("link"),
                F.regexp_extract(b, pub, 1).alias("published"),
                _xml_unescape_expr(
                    F.regexp_extract(b, gid, 1)).alias("guid"))

        return F.transform(
            F.regexp_extract_all(xml, F.lit(block_re), 0), fields)

    entries = F.concat(block_structs(_RSS_ITEM_RE, "rss"),
                       block_structs(_ATOM_ENTRY_RE, "atom"))
    keep = [c for c in df.columns if c != xml_col]
    out = df.select(*keep, F.posexplode(entries).alias("pos", "_e"))
    out = out.select(
        *keep, "pos",
        F.col("_e.kind").alias("kind"),
        F.col("_e.title").alias("title"),
        F.col("_e.link").alias("link"),
        F.col("_e.published").alias("published"),
        F.col("_e.guid").alias("guid"))
    return out.filter((F.col("title") != "") | (F.col("link") != ""))


# tracking parameters every crawl canonicalizer strips (public lists:
# utm_* is Google Analytics' own documented set; gclid/dclid Google
# Ads, fbclid Meta, msclkid Bing, mc_* Mailchimp, yclid Yandex,
# igshid Instagram, _ga GA cross-domain). Lowercase-exact by design:
# the trackers emit lowercase, and case-folding PARAM NAMES would
# conflate app params like 'REF' that are not trackers.
DEFAULT_TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9_]+|gclid|dclid|fbclid|msclkid|mc_cid|mc_eid|"
    "igshid|yclid|_ga)(=|$)")


def canonical_url_expr(
    url,
    tracking_param_re: str = DEFAULT_TRACKING_PARAM_RE,
) -> "F.Column":
    """RFC 3986 §6-style canonical form of a URL as a pure Column
    expression — the crawl-frontier/dedup key:

    - fragment dropped (never sent to the server),
    - scheme and host lowercased, trailing root dot and userinfo
      stripped,
    - default port removed (``:80`` for http, ``:443`` for https;
      other ports kept),
    - empty path → ``/`` (``http://a.com`` ≡ ``http://a.com/``),
    - query params: tracking params dropped, empties dropped, the
      REST SORTED bytewise and rejoined (param order is almost never
      semantic; sorting makes ``?a=1&b=2`` ≡ ``?b=2&a=1``) — a
      documented trade: the rare order-sensitive endpoint conflates,
    - a URL with no parseable scheme+host passes through trimmed and
      fragment-stripped, never nulled (error-as-data totality).

    Zero shuffle, zero Python; split/filter/sort happen inside one
    projection. Mirrors 1:1 in DuckDB (string_split + list_filter +
    list_sort + array_to_string)."""
    u = F.regexp_replace(F.trim(F.coalesce(url, F.lit(""))),
                         "(?s)#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    hostport = F.regexp_extract(auth, "^(?:[^@]*@)?(.*)$", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, "^([^:]*)", 1)), "[.]+$", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, "\\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_re)))
    q2 = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), host, port_part, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)))
    return F.when((scheme == "") | (host == ""), u).otherwise(rebuilt)


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    tracking_param_re: str = DEFAULT_TRACKING_PARAM_RE,
) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url_col`` (see
    canonical_url_expr). The standard pre-pass before
    keep_latest_capture / exact URL dedup: mirror-published tracking
    variants of one page collapse to a single frontier key."""
    return df.withColumn(
        out_col, canonical_url_expr(F.col(url_col), tracking_param_re))


# RFC 9309 §2.3 / sitemaps.org: "Sitemap:" lines are GLOBAL records
# (outside any user-agent group), one absolute URL each
_SITEMAP_LINE_RE = "(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^ \\t\\r\\n#]+)"


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Explode each host's robots.txt ``Sitemap:`` records into one
    ``(…, pos, sitemap_url)`` row — the link from the robots surface
    (parse_robots) to URL discovery (sitemap_entries): a refresh
    crawler reads these URLs, fetches them, and feeds the XML to
    sitemap_entries. Case-insensitive directive, group-position
    independent (the records are global per the RFC), comment tails
    and a leading UTF-8 BOM stripped, hosts without records emit
    nothing. One multiline regex scan + posexplode — ZERO shuffles
    (parse_robots shuffles because GROUP structure is stateful;
    sitemap records have no state)."""
    txt = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), "^\\uFEFF", "")
    urls = F.regexp_extract_all(txt, F.lit(_SITEMAP_LINE_RE), 1)
    keep = [c for c in robots.columns if c != text_col]
    return robots.select(
        *keep, F.posexplode(urls).alias("pos", "sitemap_url"))


def _row_key_expr(df: DataFrame) -> "F.Column":
    """Deterministic per-row order key: md5 over every column — stable
    across retries, engines, and cluster sizes (no monotonically_
    increasing_id, whose values depend on partition layout)."""
    return F.md5(F.concat_ws(
        "\x00", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                  for c in df.columns]))


def cap_per_host(
    df: DataFrame,
    host_col: str = "host",
    max_per_host: int = 1000,
    salt_buckets: int = 64,
) -> DataFrame:
    """EXACT deterministic per-host keep-cap — the per-domain fetch
    budget (CommonCrawl-style) — without ever shipping a mega-host's
    full URL set to one task.

    Two-phase top-K: rows first rank inside ``(host, salt)`` — the salt
    is md5-derived from the row, so the shuffle spreads a hot host over
    ``salt_buckets`` tasks — and anything ranked past the cap within
    its bucket can't be in the host's global top-cap, so it drops
    BEFORE the second phase. Survivors (≤ salt_buckets × cap per host)
    then rank once per host for the exact cut. The keeper set is the
    cap-smallest md5 keys — arbitrary-but-deterministic, the right
    semantics for a budget (no URL is 'better', the cap just has to be
    stable across runs).

    Shuffle shape: two exchanges, the first salt-spread (no hot task),
    the second bounded to salt_buckets×cap rows per host."""
    from pyspark.sql import Window

    key = _row_key_expr(df)
    salted = df.withColumn("_key", key).withColumn(
        "_salt",
        F.conv(F.substring(F.col("_key"), 1, 8), 16, 10).cast("long")
        % salt_buckets)
    w1 = (Window.partitionBy(F.col(host_col), F.col("_salt"))
          .orderBy(F.col("_key")))
    phase1 = (salted.withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= max_per_host))
    w2 = Window.partitionBy(F.col(host_col)).orderBy(F.col("_key"))
    return (phase1.withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= max_per_host)
            .drop("_key", "_salt", "_r1", "_r2"))


def partition_frontier_by_host(
    df: DataFrame,
    host_col: str = "host",
    num_partitions: int | None = None,
    salt_threshold: int = 10_000,
) -> DataFrame:
    """Politeness layout for a crawl frontier: co-locate each host's
    URLs (a fetcher task owns the host's rate limit) while splitting
    only the hosts that would starve the stage.

    A host with ≤ ``salt_threshold`` URLs lands in ONE partition
    (salt 0 — co-location preserved). A bigger host splits over
    ⌈n/salt_threshold⌉ deterministic md5 salts — politeness then
    rate-limits per fetcher task, the documented trade for not
    serializing a 10M-URL host behind one task. The over-threshold
    host list is host-cardinality-sized and broadcast; the ONE
    corpus-scale exchange is the layout repartition itself.

    Row content is unchanged (the salt helper is dropped); only the
    physical layout differs."""
    host = F.col(host_col)
    big = (df.groupBy(host.alias("_h"))
           .agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > salt_threshold))
    joined = df.join(F.broadcast(big), host == F.col("_h"), "left")
    nsplit = F.ceil(F.col("_n") / F.lit(salt_threshold))
    salt = F.when(
        F.col("_n").isNotNull(),
        F.conv(F.substring(_row_key_expr(df), 1, 8), 16, 10)
        .cast("long") % nsplit).otherwise(F.lit(0))
    out = joined.withColumn("_salt", salt).drop("_h", "_n")
    parts = [host, F.col("_salt")]
    out = (out.repartition(num_partitions, *parts) if num_partitions
           else out.repartition(*parts))
    return out.drop("_salt")
