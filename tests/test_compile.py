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


def test_integer_type_on_double_beyond_int64(spark):  # C1 edge
    """floor(double) returns BIGINT, so a mathematically integral double
    beyond int64 (1e19) would clamp and be falsely flagged under
    floor-equality; the modulo form keeps it in double space. NaN and
    Infinity are NOT integers (NULL predicate -> detected by coalesce)."""
    vals = [1e19, 2.0, 2.5, -3.0, float("nan"), float("inf")]
    got = _eval(spark, {"type": "integer"}, vals, "DoubleType")
    assert got == [True, True, False, True, False, False]


def test_self_recursive_ref_in_doc_combinator_compiles(spark):
    """A self-recursive '#' ref inside a doc-level combinator (the shape the
    reference emits for possibleRef) must depth-cap like compile_schema does,
    not RecursionError at compile time."""
    doc = {"type": "object",
           "properties": {"role": {"enum": ["user", "assistant"]}},
           "allOf": [{"$ref": "#"}]}
    df = spark.createDataFrame([("user",), ("narrator",)], "role string")
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    rule = next(r for r in plan.row_rules if r.rule_id == "$.allOf")
    got = [bool(r[0]) for r in df.select(rule.ok).collect()]
    assert got == [True, False]


def test_doc_combinator_external_refs_not_silently_truncated(spark):
    """External $refs are resolvable only pre-parse (merge_ancestors). At
    compile time, dropping a member from anyOf/oneOf/not flips semantics
    (anyOf turns stricter -> false violations), so those rules are skipped
    whole and recorded in schema_issues; allOf keeps its in-doc members (a
    subset conjunction under-validates but never mis-validates), also
    recorded."""
    df = spark.createDataFrame([("user",)], "role string")
    any_doc = {"type": "object", "properties": {},
               "anyOf": [{"$ref": "Other.json"},
                         {"properties": {"role": {"enum": ["user"]}}}]}
    plan = compile_spec(ConstraintSpec.parse(any_doc), df.schema)
    assert not [r for r in plan.row_rules if r.rule_id == "$.anyOf"]
    assert any("anyOf" in i and "Other.json" in i for i in plan.schema_issues)

    not_doc = {"type": "object", "properties": {},
               "not": {"$ref": "Other.json"}}
    plan = compile_spec(ConstraintSpec.parse(not_doc), df.schema)
    assert not [r for r in plan.row_rules if r.rule_id == "$.not"]
    assert any("not" in i for i in plan.schema_issues)

    all_doc = {"type": "object", "properties": {},
               "allOf": [{"$ref": "Other.json"},
                         {"properties": {"role": {"enum": ["user"]}}}]}
    plan = compile_spec(ConstraintSpec.parse(all_doc), df.schema)
    assert [r for r in plan.row_rules if r.rule_id == "$.allOf"]
    assert any("allOf" in i for i in plan.schema_issues)


def test_scalar_table_cardinality_accepted_and_junk_raises(spark):
    """x-table-constraints.minItems/maxItems accept the bare-number shorthand
    (per=None -> the runner's default group key); a silently-dropped bound
    would be a constraint the author believes is active but never runs.
    Non-numeric shapes raise."""
    spec = ConstraintSpec.parse({
        "type": "object", "properties": {},
        "x-table-constraints": {"minItems": 2, "maxItems": 5}})
    assert spec.table.min_items == 2 and spec.table.max_items == 5
    assert spec.table.group_key is None
    with pytest.raises(ValueError, match="minItems"):
        ConstraintSpec.parse({"type": "object", "properties": {},
                              "x-table-constraints": {"minItems": "two"}})
    with pytest.raises(ValueError, match="per"):
        ConstraintSpec.parse({
            "type": "object", "properties": {},
            "x-table-constraints": {
                "minItems": 2,
                "maxItems": {"per": "conv_id", "value": 5}}})
