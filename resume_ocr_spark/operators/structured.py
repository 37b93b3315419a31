"""Structured-data extraction from crawl HTML: ``<table>`` → typed rows.

Web corpora carry a long tail of relational facts locked inside HTML
tables (infoboxes, league standings, spec sheets). Training-data
pipelines either linearize them (markdown-ish rows for the LM) or lift
them into side tables for retrieval — both start from the same
primitive this module provides: explode every table into one row per
CELL with (table_idx, row_idx, col_idx, is_header, cell) coordinates.
The reference app has no crawl surface (its HTML handling is resume
boilerplate-strip, `app/services/ocr_service.py`); this extends the
jusText/boilerplate family (extract.strip_html_column) to the
structured side of the page.

Distributed shape — the whole operator is pure Column ops:
three nested ``regexp_extract_all`` + ``posexplode`` levels
(tables → rows → cells), ZERO shuffles, zero Python, inside
whole-stage codegen except the Generate nodes. Explodes are narrow:
a 100 TB scan fans out in place, no exchange. Every regex is in the
RE2 ∩ Java subset (no backrefs/lookaround) so the DuckDB oracle
mirrors 1:1; content whitespace uses an explicit class because Java's
``\\s`` includes vertical tab while RE2's does not (structural
``\\s`` between TAGS keeps the shorthand — a ``\\x0B`` inside markup
is not a realistic page).

Semantics (documented limits of regex-grade extraction, shared with
every production boilerplate pipeline that predates a full DOM):

- Nested ``<table>`` inside a cell: the non-greedy block regex stops
  at the FIRST ``</table>``, so the outer table is truncated at the
  inner close and the remainder is not re-scanned. Rare in main
  content (layout-table nesting died with the spacer GIF); callers
  needing full fidelity route those pages to the DOM parser.
- ``<thead>/<tbody>/<tfoot>`` wrappers are transparent: only
  ``<tr>``-level structure is read. ``colspan``/``rowspan`` attributes
  are ignored — col_idx counts CELLS, not grid columns.
- Cell text: inner tags stripped FIRST (so ``&lt;`` decoding cannot
  manufacture strippable tags), then the five XML entities decoded,
  then whitespace collapsed and trimmed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# '(?:\s[^>]*)?>' rather than '\b[^>]*>': '<th' must not swallow
# '<thead>' and '<tr' must not swallow '<track>' — the tag name is
# complete only when followed by whitespace(attrs) or the closing '>'
_TABLE_RE = r"(?is)<table(?:\s[^>]*)?>(.*?)</table\s*>"
_TR_RE = r"(?is)<tr(?:\s[^>]*)?>(.*?)</tr\s*>"
_CELL_RE = r"(?is)<(t[dh])(?:\s[^>]*)?>(.*?)</t[dh]\s*>"
_TAG_STRIP_RE = r"(?is)<[^>]*>"


def _cell_text_expr(raw) -> "F.Column":
    """Tag-strip → entity-decode → whitespace-collapse, in that order
    (decoding first would let '&lt;b&gt;' become a strippable tag).
    Decode and whitespace-class are the shared urltools exprs so the
    amp-last ordering and the RE2∩Java class stay single-sourced."""
    from resume_ocr_spark.operators.urltools import (_WS_RUN_RE,
                                                     _xml_unescape_expr)

    out = _xml_unescape_expr(F.regexp_replace(raw, _TAG_STRIP_RE, " "))
    return F.trim(F.regexp_replace(out, _WS_RUN_RE, " "))


def html_tables(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Explode every ``<table>`` in ``html_col`` into one row per cell:
    ``(…other cols, table_idx, row_idx, col_idx, is_header, cell)``.

    ``is_header`` is per-CELL (``<th>`` vs ``<td>``) — real pages mix
    header cells into body rows (row headers), so a row-level flag
    would lose information. Documents without tables produce no rows.

    Plan: scan → three Generate (posexplode) levels → project. No
    exchange at any size; cost is the regex scans, all codegen.
    """
    html = F.coalesce(F.col(html_col), F.lit(""))
    keep = [c for c in df.columns if c != html_col]

    step1 = df.select(
        *keep,
        F.posexplode(F.regexp_extract_all(html, F.lit(_TABLE_RE), 1))
        .alias("table_idx", "_tbl"))
    step2 = step1.select(
        *keep, "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(_TR_RE), 1))
        .alias("row_idx", "_row"))
    # two extract_alls over the SAME pattern with different group
    # indices are position-aligned by construction; arrays_zip keeps
    # (tag, text) pairs together through the explode
    row = F.col("_row")
    cells = F.arrays_zip(
        F.regexp_extract_all(row, F.lit(_CELL_RE), 1).alias("tag"),
        F.regexp_extract_all(row, F.lit(_CELL_RE), 2).alias("raw"))
    step3 = step2.select(
        *keep, "table_idx", "row_idx",
        F.posexplode(cells).alias("col_idx", "_c"))
    return step3.select(
        *keep, "table_idx", "row_idx", "col_idx",
        (F.lower(F.col("_c.tag")) == "th").alias("is_header"),
        _cell_text_expr(F.col("_c.raw")).alias("cell"))


def linearize_tables(
    cells: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    cell_sep: str = " | ",
) -> DataFrame:
    """Re-serialize exploded cells into one text line per table row
    (``cell_sep``-joined, cells in col_idx order) — the LM-ready
    linearization step. One hash shuffle on (id, table_idx, row_idx)
    with map-side combine; at 100 TB the groupBy key includes doc_id so
    the shuffle is corpus-wide but perfectly parallel (no hot keys:
    a table row has bounded cells).
    """
    key = [*id_cols, "table_idx", "row_idx"]
    return (cells
            .groupBy(*key)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("col_idx", "cell"))),
                    lambda s: s["cell"]),
                cell_sep).alias("row_text"),
                 F.count(F.lit(1)).alias("n_cells"),
                 F.max(F.col("is_header").cast("int")).cast("boolean")
                 .alias("has_header_cell")))


# page-metadata tag shapes — same conventions as urltools' robots-meta
# parser (tag scan case-insensitive, attributes matched independently
# within the tag so order never matters, quote-tolerant). The name/rel
# values end at a closing quote, whitespace, '/' or '>' (char class,
# not \b: '-' is a \b boundary and would false-match "description-x").
_META_TAG_RE = "(?i)<meta\\b[^>]*>"
_LINK_TAG_RE = "(?i)<link\\b[^>]*>"
_NAME_DESC_RE = "(?i)name\\s*=\\s*[\"']?description[\"'\\s/>]"
_PROP_OGTITLE_RE = "(?i)property\\s*=\\s*[\"']?og:title[\"'\\s/>]"
_REL_CANON_RE = "(?i)rel\\s*=\\s*[\"']?canonical[\"'\\s/>]"
_CONTENT_QUOTED_RE = "(?i)content\\s*=\\s*[\"']([^\"']*)[\"']"
_CONTENT_BARE_RE = "(?i)content\\s*=\\s*([^\\s\"'>]+)"
_HREF_QUOTED_RE = "(?i)href\\s*=\\s*[\"']([^\"']*)[\"']"
_HREF_BARE_RE = "(?i)href\\s*=\\s*([^\\s\"'>]+)"
_TITLE_TEXT_RE = r"(?is)<title(?:\s[^>]*)?>\s*(.*?)\s*</title\s*>"
_HTML_LANG_RE = "(?i)<html\\b[^>]*\\slang\\s*=\\s*[\"']?([A-Za-z0-9-]+)"


def _first_tag_attr(html, tag_re: str, marker_re: str,
                    quoted_re: str, bare_re: str) -> "F.Column":
    """Value of ``quoted_re``/``bare_re`` from the FIRST tag matching
    ``tag_re`` that carries ``marker_re`` — attribute-order-free tag
    selection via array filter, RE2-safe (mirrors as list_filter)."""
    tags = F.regexp_extract_all(html, F.lit(tag_re), 0)
    tag = F.get(F.filter(tags, lambda t: t.rlike(marker_re)), 0)
    quoted = F.coalesce(F.regexp_extract(tag, quoted_re, 1), F.lit(""))
    bare = F.coalesce(F.regexp_extract(tag, bare_re, 1), F.lit(""))
    return F.when(quoted != "", quoted).otherwise(bare)


def page_metadata(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add the head-metadata columns a web-corpus curator keys on:

    - ``title`` — ``<title>`` text, entities decoded, whitespace
      collapsed (the snippet/dedup signal),
    - ``meta_description`` — ``<meta name=description content=…>``
      (same cleanup),
    - ``canonical_url`` — ``<link rel=canonical href=…>``, entities
      decoded (pair with urltools.canonical_url_expr for the frontier
      key: the PUBLISHER's dedup hint vs the crawler's),
    - ``og_title`` — ``<meta property=og:title …>`` (often cleaner
      than <title>, which carries site-name suffixes),
    - ``lang`` — ``<html lang=…>`` attribute, lowercased (cheap
      publisher label; textstats.lang_id is the content-based check).

    First matching tag wins per field; absent fields are empty
    strings, never null (error-as-data totality). Zero shuffle, zero
    Python — one codegen projection; at 100 TB this runs inside the
    scan like the other triage columns.
    """
    from resume_ocr_spark.operators.urltools import (_WS_RUN_RE,
                                                     _xml_unescape_expr)

    html = F.coalesce(F.col(html_col), F.lit(""))

    def clean(col):
        return F.trim(F.regexp_replace(
            _xml_unescape_expr(col), _WS_RUN_RE, " "))

    title = clean(F.regexp_extract(html, _TITLE_TEXT_RE, 1))
    desc = clean(_first_tag_attr(html, _META_TAG_RE, _NAME_DESC_RE,
                                 _CONTENT_QUOTED_RE, _CONTENT_BARE_RE))
    og = clean(_first_tag_attr(html, _META_TAG_RE, _PROP_OGTITLE_RE,
                               _CONTENT_QUOTED_RE, _CONTENT_BARE_RE))
    canon = _xml_unescape_expr(
        _first_tag_attr(html, _LINK_TAG_RE, _REL_CANON_RE,
                        _HREF_QUOTED_RE, _HREF_BARE_RE))
    lang = F.lower(F.regexp_extract(html, _HTML_LANG_RE, 1))
    return (df
            .withColumn("title", title)
            .withColumn("meta_description", desc)
            .withColumn("canonical_url", canon)
            .withColumn("og_title", og)
            .withColumn("lang", lang))


# html→markdown rewrite rules. Each is a (pattern, spark_replacement)
# pair applied IN ORDER by a chain of regexp_replace calls — order is
# semantic: invisible content first (nothing inside a script may be
# rewritten as markdown), then structural tags, then inline marks,
# then the generic tag strip, then entities, then whitespace.
# RE2 ∩ Java regexes; replacements use $N (Spark) / \N (DuckDB) —
# the one dialect split, kept in _md_oracle_replacement().
_MD_INVISIBLE_RES = (
    r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>",
    r"(?is)<style(?:\s[^>]*)?>.*?</style\s*>",
    r"(?is)<!--.*?-->",
)
_MD_RULES: tuple[tuple[str, str], ...] = (
    # headings: one rule per level (the repeat count can't come from a
    # backreference), innermost tags inside the heading already handled
    # by rule order below — so headings go FIRST among structure
    *((rf"(?is)<h{n}(?:\s[^>]*)?>\s*(.*?)\s*</h{n}\s*>",
       "\n\n" + "#" * n + " $1\n\n") for n in range(1, 7)),
    # links before the generic strip (need href + text together);
    # block-level <a> is rare enough to treat inline
    (r"(?is)<a\s[^>]*href\s*=\s*\"([^\"]*)\"[^>]*>(.*?)</a\s*>",
     "[$2]($1)"),
    # inline emphasis
    (r"(?is)<(?:b|strong)(?:\s[^>]*)?>(.*?)</(?:b|strong)\s*>", "**$1**"),
    (r"(?is)<(?:i|em)(?:\s[^>]*)?>(.*?)</(?:i|em)\s*>", "*$1*"),
    # list items and breaks/paragraph starts → line structure
    (r"(?is)<li(?:\s[^>]*)?>", "\n- "),
    (r"(?is)<br\s*/?\s*>", "\n"),
    (r"(?is)<(?:p|div|tr)(?:\s[^>]*)?>", "\n\n"),
)
_MD_STRIP_RE = r"(?is)<[^>]*>"


def html_to_markdown(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "markdown",
) -> DataFrame:
    """Add ``out_col`` = a markdown rendering of ``html_col`` — the
    LM-ready extraction format (headings ``#``–``######``, links
    ``[text](href)``, ``**bold**``/``*italic*``, ``- `` list items,
    paragraph breaks), scripts/styles/comments removed, every other
    tag stripped, the five XML entities decoded LAST (so ``&lt;b&gt;``
    can never become a rewritable tag), blank-line runs collapsed to
    one empty line and the result trimmed.

    Regex-grade fidelity, same documented trade as html_tables:
    nested same-tag structures resolve non-greedily to the first
    close; markdown that needs a DOM (nested lists' indentation,
    blockquote levels) degrades to flat items. This covers the
    boilerplate-stripped main-content pages a curation funnel feeds
    it — route full-fidelity needs to a DOM parser.

    Distributed shape: ONE projection of chained regexp_replace — zero
    shuffles, zero Python, whole-stage codegen; each rule mirrors 1:1
    in the DuckDB oracle ($N vs \\N replacement syntax aside).
    """
    from resume_ocr_spark.operators.urltools import (_WS_RUN_RE,
                                                     _xml_unescape_expr)

    out = F.coalesce(F.col(html_col), F.lit(""))
    for pat in _MD_INVISIBLE_RES:
        out = F.regexp_replace(out, pat, "")
    for pat, rep in _MD_RULES:
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, _MD_STRIP_RE, " ")
    out = _xml_unescape_expr(out)
    # normalize: spaces/tabs runs → one space, spaces around newlines
    # dropped, 3+ newlines → exactly one blank line, then trim
    out = F.regexp_replace(out, "[ \\t\\x0B\\f\\r]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    # trim() strips spaces only — newlines at the edges need the regex
    out = F.regexp_replace(out, "^[\\n ]+|[\\n ]+$", "")
    return df.withColumn(out_col, out)
