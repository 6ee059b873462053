"""Unit tests per compiled constraint keyword (SURVEY.md §5.2.1): each keyword
gets pass/fail/null fixture rows with hand-computed verdicts, plus a
jsonschema-style semantic check on combinators."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from owl2jsonschema_js_spark.compile import compile_schema, compile_spec
from owl2jsonschema_js_spark.spec import ConstraintSpec


def _eval(spark, schema_frag, values, dtype="StringType"):
    """Compile `schema_frag` against column v of `dtype`; return list of bools
    (null-unguarded pure predicate, null-safe coalesced to None detection)."""
    dt = getattr(T, dtype)() if isinstance(dtype, str) else dtype
    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", dt)]))
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    pred = compile_schema(schema_frag, F.col("v"), df.schema["v"].dataType, spec)
    rows = df.select(F.coalesce(pred, F.lit(False)).alias("ok")).collect()
    return [r["ok"] for r in rows]


def test_enum(spark):  # C10/C11
    assert _eval(spark, {"enum": ["user", "assistant"]},
                 ["user", "assistant", "narrator"]) == [True, True, False]


def test_pattern_anchored(spark):  # C3
    out = _eval(spark, {"pattern": r"^conv_[0-9]{8}$"},
                ["conv_00000001", "conv_1", "xconv_00000001x"])
    assert out == [True, False, False]


def test_numeric_range_exclusive(spark):  # C2
    frag = {"minimum": 0, "maximum": 10, "exclusiveMaximum": True}
    out = _eval(spark, frag, [0, 5, 10, -1], dtype="IntegerType")
    assert out == [True, True, False, False]


def test_integer_type_on_double(spark):  # C1
    out = _eval(spark, {"type": "integer"}, [1.0, 1.5], dtype="DoubleType")
    assert out == [True, False]


def test_type_on_string_payload(spark):  # C1 text-encoded
    assert _eval(spark, {"type": "integer"}, ["12", "1.5", "x"]) == [True, False, False]
    assert _eval(spark, {"type": "number"}, ["12", "1.5", "x"]) == [True, True, False]
    assert _eval(spark, {"type": "boolean"}, ["true", "False", "yes"]) == [True, True, False]


def test_format_datetime(spark):  # C4
    out = _eval(spark, {"format": "date-time"},
                ["2025-01-01T10:20:30Z", "2025-13-01T10:20:30Z", "nope"])
    assert out == [True, False, False]


def test_xsd_datetime_pattern_matches_reference_lexical_space(spark):  # C3
    from owl2jsonschema_js_spark.xsd_facets import XSD_FACETS
    pat = XSD_FACETS["dateTime"]["pattern"]
    good = ["2025-01-01T00:00:00", "2025-01-01T23:59:59.123+05:30", "-0042-12-31T00:00:00Z"]
    bad = ["2025-1-01T00:00:00", "2025-01-01 00:00:00", "2025-01-01T24:00:01"]
    out = _eval(spark, {"pattern": pat}, good + bad)
    assert out == [True] * 3 + [False] * 3


def test_oneof_is_exactly_one(spark):  # C15/hard-part #2: XOR-count, not OR
    frag = {"oneOf": [{"minimum": 0}, {"maximum": 10}]}
    # 5 matches both branches -> oneOf FAILS; -1 matches only maximum -> passes
    out = _eval(spark, frag, [5, -1, 11], dtype="IntegerType")
    assert out == [False, True, True]


def test_combinators(spark):  # C13-C16
    assert _eval(spark, {"allOf": [{"minimum": 0}, {"maximum": 5}]},
                 [3, 9], dtype="IntegerType") == [True, False]
    assert _eval(spark, {"anyOf": [{"maximum": 0}, {"minimum": 5}]},
                 [3, 9], dtype="IntegerType") == [False, True]
    assert _eval(spark, {"not": {"enum": ["x"]}}, ["x", "y"]) == [False, True]


def test_array_items_exists_forall(spark):  # C8/C9
    at = T.ArrayType(T.StringType())
    # someValuesFrom -> exists
    frag = {"items": {"anyOf": [{"pattern": "^t[0-9]+$"}]}, "additionalItems": True}
    out = _eval(spark, frag, [["t1", "zz"], ["zz"]], dtype=at)
    assert out == [True, False]
    # allValuesFrom -> forall
    frag = {"items": {"allOf": [{"pattern": "^[a-z]+$"}]}, "additionalItems": False}
    out = _eval(spark, frag, [["ab", "cd"], ["ab", "C3"]], dtype=at)
    assert out == [True, False]


def test_array_cardinality_and_unique(spark):  # C5/C6/C12 array scope
    at = T.ArrayType(T.StringType())
    frag = {"minItems": 1, "maxItems": 2, "uniqueItems": True}
    out = _eval(spark, frag, [["a"], [], ["a", "b", "c"], ["a", "a"]], dtype=at)
    assert out == [True, False, False, False]


def test_ref_resolution(spark):  # C19 in-document
    spec = ConstraintSpec.parse({
        "type": "object",
        "definitions": {"posint": {"type": "integer", "minimum": 1}},
        "properties": {},
    })
    df = spark.createDataFrame([(1,), (0,)], "v int")
    pred = compile_schema({"$ref": "#/definitions/posint"}, F.col("v"),
                          T.IntegerType(), spec)
    assert [r[0] for r in df.select(pred).collect()] == [True, False]


def test_null_semantics(spark):  # hard-part #4: only `required` is null-sensitive
    doc = {
        "type": "object",
        "required": ["a"],
        "properties": {
            "a": {"type": "string", "pattern": "^x"},
            "b": {"type": "string", "enum": ["p", "q"]},
        },
    }
    spec = ConstraintSpec.parse(doc)
    df = spark.createDataFrame(
        [("x1", "p"), (None, None), ("y1", "zz")], "a string, b string")
    plan = compile_spec(spec, df.schema)
    ids = [r.rule_id for r in plan.row_rules]
    assert "a.required" in ids and "b.enum" in ids
    got = {r.rule_id: [row[0] for row in df.select(r.ok).collect()] for r in plan.row_rules}
    assert got["a.required"] == [True, False, True]
    assert got["b.enum"] == [True, True, False]   # null b passes enum (absent)
    assert got["a.pattern"] == [True, True, False]


def test_oneof_null_branch_on_guarded_column(spark):
    # tool: oneOf [type:null, string format] — on non-null rows the null branch
    # fails and the string branch decides; null rows never reach the predicate
    # (top-level guard).
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    frag = {"oneOf": [{"type": "null"}, {"type": "string", "pattern": "^tool_"}]}
    df = spark.createDataFrame([("tool_1",), ("bad",)], "v string")
    pred = compile_schema(frag, F.col("v"), T.StringType(), spec)
    assert [r[0] for r in df.select(pred).collect()] == [True, False]


def test_schema_issue_reported_for_missing_column(spark):
    spec = ConstraintSpec.parse({
        "type": "object", "required": ["zzz"], "properties": {"zzz": {"type": "string"}}})
    df = spark.createDataFrame([("a",)], "a string")
    plan = compile_spec(spec, df.schema)
    assert any("zzz" in i for i in plan.schema_issues)
    assert not plan.row_rules
