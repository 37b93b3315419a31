"""Semi-structured ingestion (operators/jsontools.py): typed scalar
extraction, array unnest, generic leaf flattening vs a python json walk,
corrupt-row totality, and bounded schema inference."""

import json

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import jsontools as J

DOCS = [
    (1, '{"a":1,"b":{"c":2,"d":"x"},"e":[1,2,3],"s":"hi"}'),
    (2, '{"a":7,"b":{"c":9,"n":{"deep":1}},"e":[],"s":"yo"}'),
    (3, 'not json at all {{{'),
    (4, None),
    # JSON nulls at both depths: must flatten as scalar leaves with a
    # NULL value, never silently drop (review finding)
    (5, '{"a":null,"b":{"c":null,"d":4},"z":0}'),
]


@pytest.fixture(scope="module")
def jdf(spark):
    return spark.createDataFrame(DOCS, "id long, js string")


def test_json_scalars_typed_and_total(jdf):
    out = J.json_scalars(jdf, "js", {
        "a": ("$.a", "bigint"),
        "c": ("$.b.c", "int"),
        "s": ("$.s", "string"),
        "missing": ("$.zzz", "double"),
    })
    rows = {r.id: (r.a, r.c, r.s, r.missing) for r in out.collect()}
    assert rows[1] == (1, 2, "hi", None)
    assert rows[2] == (7, 9, "yo", None)
    assert rows[3] == (None, None, None, None)  # corrupt → NULLs, no error
    assert rows[4] == (None, None, None, None)


def test_json_array_unnest(jdf):
    out = J.json_array_unnest(jdf, "js", "$.e", ["id"],
                              element_type="bigint")
    rows = [(r.id, r.idx, r.element) for r in out.collect()]
    assert sorted(rows) == [(1, 0, 1), (1, 1, 2), (1, 2, 3)]


def _py_flatten(js, max_depth):
    """Reference walk mirroring the operator's contract (compact
    re-serialization for non-scalar leaves)."""
    def ser(v):
        if v is None:
            return None
        if isinstance(v, (dict, list)):
            return json.dumps(v, separators=(",", ":"))
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def kind(v):
        return ("object" if isinstance(v, dict)
                else "array" if isinstance(v, list) else "scalar")

    out = []

    def walk(node, path, depth):
        for k, v in node.items():
            p = f"{path}.{k}"
            if isinstance(v, dict) and depth < max_depth:
                walk(v, p, depth + 1)
            else:
                out.append((p, kind(v), ser(v)))

    try:
        obj = json.loads(js)
    except (TypeError, ValueError):
        return []
    if not isinstance(obj, dict):
        return []
    walk(obj, "$", 1)
    return out


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_json_flatten_python_parity(jdf, depth):
    got = sorted((r.id, r.path, r.kind, r.value)
                 for r in J.json_flatten(jdf, "js", ["id"],
                                         max_depth=depth).collect())
    want = sorted((i, p, k, v) for i, js in DOCS
                  for p, k, v in _py_flatten(js, depth))
    assert got == want


def test_infer_and_parse_roundtrip(jdf):
    schema = J.infer_json_schema(jdf, "js")
    names = set(schema.fieldNames())
    assert {"a", "b", "e", "s"} <= names
    parsed = J.with_parsed(jdf, "js", schema)
    rows = {r.id: r.parsed for r in parsed.collect()}
    assert rows[1].a == 1 and rows[1].b.c == 2
    assert rows[3] is None or rows[3].a is None  # corrupt stays total
