"""Hyperlink-graph operators: outlink extraction, host graph, PageRank.

The domain-authority pass of web-corpus curation: CommonCrawl publishes
host/domain-level rank tables (harmonic centrality + PageRank) and the
RefinedWeb/FineWeb lineage uses link-graph signals as a quality prior
beside the URL blocklists (`urltools`) and content filters (`textstats`).
The reference app has no crawl surface (PDF/PNG/JPG uploads only,
app/utils/utils.py:43-44); this family extends SURVEY §2.7's curation
inventory to the link axis, completing the crawl triage trio:
URL → content → graph.

Three operators, each designed for the 100 TB shape:

  extract_outlinks  — `<a href>` targets of each page as absolute URLs:
                      pure Column ops (two regexp_extract_all passes +
                      one explode), zero shuffles, dialect-neutral so
                      the DuckDB oracle mirrors it 1:1
  host_link_graph   — (src_domain, dst_domain, weight) edge list: ONE
                      hash shuffle with map-side combine; output is
                      domain²-bounded, tiny next to the corpus
  pagerank          — fixed-iteration weighted PageRank over the edge
                      list with dangling-mass redistribution; per
                      iteration ONE node-sized shuffle (ranks meet the
                      cached pre-partitioned edges) + ONE edge-sized
                      aggregate exchange (map-side combined), never an
                      edge re-shuffle and never a corpus-sized anything

Scale notes (1e8 domains / 1e10 edges): the edge list is normalized and
hash-partitioned by ``src`` ONCE and persisted — iterations re-shuffle
only the node-sized rank table to meet it, and the per-destination sum
is a partial-aggregated exchange whose skew (mega in-degree hubs like
wikipedia.org) is exactly the shape map-side combine + AQE skew handling
absorb. The dangling-rank scalar is a 1-row aggregate cross-joined back
(the `similarity.py` 1-row broadcast-probe pattern), not a collect-loop.
Lineage is cut every iteration via localCheckpoint/checkpoint exactly as
`dedup.cluster_assignments` does (round-2 verdict #5: pass a reliable
``checkpoint_dir`` on a real cluster so executor loss replays from the
snapshot instead of recomputing the full iteration stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resume_ocr_spark.operators import urltools

# <a href> extraction: one pattern per quote style (a single alternation
# would renumber the capture group between branches; two passes keep
# group 1 stable and both patterns inside the RE2/Java common subset —
# no backrefs, no lookaround — so DuckDB runs the identical regex).
# [^>]* before href: attributes may precede it; lazy so the first href
# attribute in the tag wins, matching how browsers resolve duplicates.
HREF_DQ_RE = "(?i)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""
HREF_SQ_RE = "(?i)<a\\s[^>]*?href\\s*=\\s*'([^']*)'"

# absolute-URL lead: any RFC 3986 scheme (mailto:, javascript:, tel:,
# data: are dropped later by the http(s) gate)
_ABS_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*:"

# whole <a ...>...</a> elements (dotall: anchor text may span newlines;
# lazy close: stop at the FIRST </a>, nested anchors are invalid HTML and
# browsers auto-close them the same way). Group 0 extraction keeps href
# and inner text paired per element — two independent per-attribute
# passes (the extract_outlinks shape) cannot pair them once any tag lacks
# one of the two. RE2/Java common subset, so DuckDB mirrors it verbatim.
ANCHOR_ELEM_RE = "(?is)<a\\s[^>]*>.*?</a\\s*>"

# markup → text: strip every remaining tag (the <a ...> wrapper and any
# nested inline markup), then collapse runs of whitespace
_TAG_RE = "(?is)<[^>]*>"
_WS_RE = "\\s+"


def _link_and_host(h, base_scheme, base_origin, base_host):
    """The shared href-resolution CASEs over a NAMED stripped-href column.

    Both consumers (`extract_outlinks`, `extract_anchors`) keep ``link``
    and ``link_host`` as PARALLEL CASEs over the named column — neither
    nests the other (codegen cannot CSE subexpressions inside when()
    branches; nesting inlined the base-origin regexes per branch and
    pushed doConsume past janino's 64 KB method limit — measured, see
    extract_outlinks)."""
    is_http = h.rlike("^(?i)https?://")
    link = (
        F.when(h == "", F.lit(""))  # empty / fragment-only: drop
        .when(is_http, h)
        .when(h.rlike(_ABS_RE), F.lit(""))  # non-http scheme: drop
        .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(base_origin, h))
        .otherwise(F.concat(base_origin, F.lit("/"), h))
    )
    link_host = (
        F.when(is_http, urltools.host_expr(h))
        .when(h.rlike(_ABS_RE), F.lit(""))
        .when(h.startswith("//"),
              F.regexp_replace(F.lower(F.regexp_extract(
                  h, "^//(?:[^@/?#]*@)?([^:/?#]*)", 1)), "[.]+$", ""))
        .otherwise(base_host)
    )
    return link, link_host


def extract_outlinks(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    two_level_suffixes: tuple[str, ...] = urltools.DEFAULT_TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Explode each page's ``<a href>`` targets into absolute URLs.

    Adds ``link`` (absolute URL string) and ``link_domain`` (registered
    domain of the target, via the same eTLD+1 logic as
    :func:`urltools.with_url_parts`), one output row per extracted link;
    pages with no links produce no rows.  Resolution rules:

      * ``http(s)://...``        — kept as-is (own authority)
      * other schemes            — dropped (mailto:, javascript:, …)
      * ``//host/path``          — protocol-relative: page scheme + link
      * ``/path`` or relative    — inherits the page's origin; the graph
                                   consumes only the HOST, so dot-segment
                                   path fidelity is irrelevant and not
                                   reconstructed
      * ``#fragment`` / empty    — dropped

    Pure Column ops end-to-end: two ``regexp_extract_all`` passes (one
    per attribute-quote style), ``explode`` of their concatenation, and
    string builds — zero shuffles, zero Python, whole-stage codegen.
    The explode is the bounded fan-out of links-per-page (~100), the
    same C1 shape as the span explode in `operators/extract.py`.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    url = F.coalesce(F.col(url_col), F.lit(""))
    base_scheme = F.lower(F.regexp_extract(url, urltools._SCHEME_RE, 1))
    base_host = urltools.host_expr(F.col(url_col))
    base_origin = F.concat(base_scheme, F.lit("://"), base_host)

    hrefs = F.concat(
        F.regexp_extract_all(html, F.lit(HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(html, F.lit(HREF_SQ_RE), F.lit(1)),
    )
    # fragment stripped once into a named column; link and link_host are
    # then PARALLEL CASEs over it, neither nesting the other — codegen
    # cannot CSE subexpressions inside when() branches, so deriving
    # link_host from the link CASE (which itself nests the base-origin
    # regexes per branch) inlines exponentially and pushed the generated
    # doConsume past janino's 64 KB method limit (measured: ERROR
    # CodeGenerator → interpreter fallback for the whole stage)
    out = (
        df.withColumn("_href", F.explode(hrefs))
        .withColumn("_h", F.regexp_replace(F.col("_href"), "#.*$", ""))
    )
    link, link_host = _link_and_host(
        F.col("_h"), base_scheme, base_origin, base_host)
    out = (
        out.withColumn("link", link)
        .withColumn("link_host", link_host)
        .filter(F.col("link") != "")
        .drop("_href", "_h")
    )
    # registered domain of the TARGET — the shared eTLD+1 Column logic
    # on the named link_host column (bounded inlining: the regex form of
    # registered_domain_expr references it a handful of times), named
    # link_* so the caller's page-side host/domain columns are untouched
    return out.withColumn("link_domain", urltools.registered_domain_expr(
        F.col("link_host"), two_level_suffixes))


def extract_anchors(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    two_level_suffixes: tuple[str, ...] = urltools.DEFAULT_TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Explode each page's anchors into ``(link, link_host, link_domain,
    anchor)`` rows — the href AND the human-visible anchor text, paired.

    Anchor text is the classic off-page relevance/quality signal (the
    original Brin/Page architecture indexes it against the TARGET page;
    CommonCrawl-lineage curation uses aggregated anchor text as a prior
    beside the link graph itself).  `extract_outlinks` cannot produce it:
    its two per-quote-style href passes lose the pairing between an href
    and the inner text of the SAME tag.  Here one ``regexp_extract_all``
    pulls whole ``<a ...>...</a>`` elements (group 0), the explode is the
    same bounded links-per-page fan-out, and href / anchor text are then
    per-element extractions — still pure Column ops, zero shuffles, zero
    Python, whole-stage codegen, and every regex in the RE2/Java common
    subset so the DuckDB oracle mirrors it 1:1.

    Resolution of the href reuses :func:`_link_and_host` (identical
    semantics to `extract_outlinks`).  Anchor text = the element with all
    markup stripped (nested ``<b>``/``<span>`` inline tags included),
    whitespace collapsed, trimmed.  Rows with an empty resolved link OR
    empty anchor text are dropped (an image-only or whitespace-only
    anchor carries no text signal).
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    url = F.coalesce(F.col(url_col), F.lit(""))
    base_scheme = F.lower(F.regexp_extract(url, urltools._SCHEME_RE, 1))
    base_host = urltools.host_expr(F.col(url_col))
    base_origin = F.concat(base_scheme, F.lit("://"), base_host)

    # per-element regex work happens INSIDE a transform lambda, so the
    # explode emits already-computed (h, anchor) structs and every
    # downstream reference is a CHEAP struct-field access.  Exploding
    # raw elements and re-extracting after was measured to overflow:
    # `_h` became a 3-regex CASE tree that the href-resolution CASEs and
    # registered_domain_expr multiply ~20×, pushing the Generate stage's
    # doConsume past janino's 64 KB limit (ERROR CodeGenerator →
    # interpreter fallback).  The lambda also evaluates each regex ONCE
    # per element instead of once per inlined copy — the dsir lesson
    # (no CSE across copies) applied in the profitable direction.
    def _pair(e):
        dq = F.regexp_extract(e, HREF_DQ_RE, 1)
        sq = F.regexp_extract(e, HREF_SQ_RE, 1)
        h = F.regexp_replace(
            F.when(dq != "", dq).otherwise(sq), "#.*$", "")
        anchor = F.trim(F.regexp_replace(
            F.regexp_replace(e, _TAG_RE, " "), _WS_RE, " "))
        return F.struct(h.alias("h"), anchor.alias("anchor"))

    out = df.withColumn(
        "_p",
        F.explode(F.transform(
            F.regexp_extract_all(html, F.lit(ANCHOR_ELEM_RE), F.lit(0)),
            _pair)),
    )
    link, link_host = _link_and_host(
        F.col("_p.h"), base_scheme, base_origin, base_host)
    out = (
        out.withColumn("link", link)
        .withColumn("link_host", link_host)
        .withColumn("anchor", F.col("_p.anchor"))
        .filter((F.col("link") != "") & (F.col("anchor") != ""))
        .drop("_p")
    )
    return out.withColumn("link_domain", urltools.registered_domain_expr(
        F.col("link_host"), two_level_suffixes))


def anchor_text_stats(
    anchors: DataFrame,
    src_col: str = "domain",
    dst_col: str = "link_domain",
    anchor_col: str = "anchor",
    drop_self: bool = True,
) -> DataFrame:
    """Aggregate anchor rows into per-target-domain anchor-text stats:
    ``(link_domain, total_anchors, n_src_domains, top_anchor,
    top_anchor_n)``.

    ``top_anchor`` is the modal anchor text pointing at the domain
    (ties broken by lexicographically smallest text — deterministic
    across engines/retries), ``n_src_domains`` the EXACT count of
    distinct linking domains (the authority-breadth signal — 1,000
    anchors from one domain is spam, from 900 domains it is standing).

    Distributed shape: the corpus-sized anchor rows are consumed EXACTLY
    ONCE, by a single (dst, anchor, src)-keyed count — one hash shuffle
    with map-side partial aggregation, output bounded by distinct
    triples (dimension-sized, like `host_link_graph`'s edge list).
    Everything else — per-(dst, anchor) sums, per-dst totals, the exact
    distinct-source count (src appears once per triple, so a plain
    ``countDistinct`` over the triples is exact), the modal-anchor
    window, and the final dst-keyed join — runs over that small frame
    (AQE broadcasts the smaller join side).  A two-branch formulation
    (separate per-anchor and per-domain aggregations over the raw
    anchors) was measured and rejected: it scans the regex-explode
    child twice AND re-inlines the href-resolution trees once per
    branch, which pushed the Generate stage's generated doConsume past
    janino's 64 KB method limit (ERROR CodeGenerator → interpreter
    fallback for the whole stage).  ``drop_self`` mirrors
    `host_link_graph`: intra-domain navigation anchors ("home", "next")
    dominate raw counts and carry no cross-site signal.
    """
    from pyspark.sql import Window

    a = anchors.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("link_domain"),
        F.col(anchor_col).alias("_anchor"),
    ).filter((F.col("_src") != "") & (F.col("link_domain") != ""))
    if drop_self:
        a = a.filter(F.col("_src") != F.col("link_domain"))
    triples = a.groupBy("link_domain", "_anchor", "_src").agg(
        F.count(F.lit(1)).alias("_n"))
    per_anchor = triples.groupBy("link_domain", "_anchor").agg(
        F.sum("_n").alias("_n"))
    w = Window.partitionBy("link_domain").orderBy(
        F.desc("_n"), F.asc("_anchor"))
    top = (
        per_anchor.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("link_domain", F.col("_anchor").alias("top_anchor"),
                F.col("_n").alias("top_anchor_n"))
    )
    totals = triples.groupBy("link_domain").agg(
        F.sum("_n").alias("total_anchors"),
        F.countDistinct("_src").alias("n_src_domains"))
    return totals.join(top, "link_domain")


def host_link_graph(
    links: DataFrame,
    src_col: str = "domain",
    dst_col: str = "link_domain",
    drop_self: bool = True,
) -> DataFrame:
    """Aggregate exploded links into a weighted domain edge list
    ``(src_domain, dst_domain, weight)``.

    ONE hash shuffle with map-side partial aggregation; output
    cardinality is bounded by distinct (src, dst) pairs — the
    domain-level graph, not the page-level one, which is what rank
    computations consume (CommonCrawl's published ranks are host/domain
    level for the same reason: the page graph is corpus-sized, the
    domain graph is dimension-sized).  ``drop_self`` removes
    intra-domain navigation edges, which otherwise dominate weight and
    carry no cross-site authority signal."""
    edges = links.select(
        F.col(src_col).alias("src_domain"),
        F.col(dst_col).alias("dst_domain"),
    ).filter((F.col("src_domain") != "") & (F.col("dst_domain") != ""))
    if drop_self:
        edges = edges.filter(F.col("src_domain") != F.col("dst_domain"))
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("weight"))


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    weight_col: str | None = "weight",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over a domain edge list, fixed iteration count.

    Returns ``(domain, rank)`` with Σrank = 1.  Semantics (the public
    Page/Brin/Motwani/Winograd formulation with dangling-mass
    redistribution — the variant CommonCrawl's rank tables use):

      * nodes = distinct sources ∪ distinct destinations, init 1/N
      * each node splits ``damping``·rank across its out-edges
        proportionally to edge weight (``weight_col=None`` = unweighted)
      * nodes with NO out-edges (danglers) donate their damped rank
        uniformly to all nodes — without this, rank mass drains and
        hub scores are biased low
      * every node receives (1-d)/N teleport mass

    Distributed shape per iteration: the node-sized rank table joins the
    ONCE-normalized, ONCE-partitioned, persisted edge fractions on
    ``src`` (node-sized shuffle; the edge side reuses its partitioning),
    contributions aggregate per ``dst`` (edge-sized exchange, map-side
    combined — in-degree skew is absorbed by partial aggregation), and
    the dangling scalar is a 1-row aggregate cross-joined back as a
    broadcast (`similarity.py`'s 1-row probe pattern — no collect in the
    loop).  Lineage is snapped every iteration via
    localCheckpoint/``checkpoint(checkpoint_dir)`` exactly as
    `dedup.cluster_assignments` does, so iteration k+1's DAG does not
    replay iterations 1..k and an executor loss on a real cluster
    resumes from the last snapshot.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _snap(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    w = (F.col(weight_col).cast("double") if weight_col is not None
         else F.lit(1.0))
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"), w.alias("w"))
    # out-weight per source, folded into per-edge fractions ONCE — the
    # iteration never touches raw weights again
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = _snap(
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .repartition("src"))
    nodes = _snap(
        e.select(F.col("src").alias("domain"))
        .union(e.select(F.col("dst").alias("domain"))).distinct())
    n_nodes = nodes.count()  # scalar: sizes teleport + init (node-sized agg)
    danglers = _snap(nodes.join(
        e.select(F.col("src").alias("domain")).distinct(),
        "domain", "left_anti"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        ranks = _snap(_pagerank_step(
            nodes, frac, danglers, ranks, n_nodes, damping))
    return ranks


def _pagerank_step(
    nodes: DataFrame,
    frac: DataFrame,
    danglers: DataFrame,
    ranks: DataFrame,
    n_nodes: int,
    damping: float,
) -> DataFrame:
    """One un-snapped power iteration — factored out so the executed-plan
    test can pin ITS shuffle shape (the returned frame of :func:`pagerank`
    is a checkpoint scan, which hides the iteration plan)."""
    contrib = (
        frac.join(ranks.withColumnRenamed("domain", "src"), "src")
        .groupBy(F.col("dst").alias("domain"))
        .agg(F.sum(F.col("frac") * F.col("rank")).alias("in_rank"))
    )
    dangling = (
        ranks.join(danglers, "domain", "left_semi")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
    )
    return (
        nodes.join(contrib, "domain", "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "domain",
            (F.lit((1.0 - damping) / n_nodes)
             + F.lit(damping)
             * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                + F.col("_dangling") / F.lit(float(n_nodes)))
             ).alias("rank"))
    )
