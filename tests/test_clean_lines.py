"""C4 line-level cleaning (textstats.with_clean_lines, round-5 tail).

The gate replica hash-checks line_clean against DuckDB every CI pass;
these tests pin the per-line semantics on edges the fixture doesn't
enumerate — terminal-punct variants (close quotes/brackets), the
min-words boundary, marker case-insensitivity, option toggles, and
the all-boilerplate empty result."""

import pytest

from resume_ocr_spark.operators import textstats


def _clean(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "id int, text string")
    r = textstats.with_clean_lines(df, **kw).collect()[0]
    return r.text_clean, r.n_lines, r.n_lines_kept


class TestCleanLines:
    def test_keeps_sentences_drops_chrome(self, spark):
        text = ("Home | News | Sports\n"
                "This is a proper sentence with enough words.\n"
                "Please enable JavaScript to view this site.\n"
                "ALL CAPS BUTTON\n"
                'He said "stop."')
        clean, n, k = _clean(spark, text)
        assert clean == ("This is a proper sentence with enough words.\n"
                         'He said "stop."')
        assert (n, k) == (5, 2)

    @pytest.mark.parametrize("line,kept", [
        ("Three word line.", True),
        ("Two words.", False),                      # min_words
        ("Ends with a question mark?", True),
        ("Ends with a bang!", True),
        ('Quoted terminal works here."', True),
        ("Closing bracket works here.)", True),
        ("Smart close quote works here.”", True),
        ("No terminal punctuation here", False),
        ("Ends with a comma,", False),
        ("Mentions JAVASCRIPT loudly today.", False),  # case-insensitive
    ])
    def test_line_rules(self, spark, line, kept):
        clean, _, k = _clean(spark, line)
        assert (k == 1) is kept
        assert (clean == line) is kept

    def test_toggles(self, spark):
        clean, _, k = _clean(spark, "No terminal punctuation here",
                             require_terminal_punct=False)
        assert k == 1
        clean, _, k = _clean(spark, "Mentions javascript politely today.",
                             drop_markers=())
        assert k == 1
        clean, _, k = _clean(spark, "Two words.", min_words=2)
        assert k == 1

    def test_all_boilerplate_yields_empty_string(self, spark):
        clean, n, k = _clean(spark, "nav\nbar\n  \n")
        assert (clean, n, k) == ("", 2, 0)

    def test_null_text(self, spark):
        clean, n, k = _clean(spark, None)
        assert (clean, n, k) == ("", 0, 0)

    def test_zero_exchanges_in_plan(self, spark):
        df = spark.createDataFrame([(0, "x")], "id int, text string")
        plan = (textstats.with_clean_lines(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
