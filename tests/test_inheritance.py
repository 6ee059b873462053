"""C13/J4 cross-document supertype merge, P13 ignore-filter, C17 disjoint,
C20/C21 provenance carry.

The reference emits subclass schemas as ``allOf:[{$ref:'<Supertype>.json'}]``
after a transitive root-first ancestor walk (lib/index.js:537-566,896-898);
``ConstraintSpec.merge_ancestors`` is the evaluation-side counterpart. The
independent oracle here is python-jsonschema's Draft4Validator with a ref
store — it resolves the same external refs natively, so engine(merged doc)
must agree with jsonschema(child doc + store) row for row."""

import jsonschema
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.spec import ConstraintSpec

DOCS = {
    "Base.json": {
        "id": "Base.json", "type": "object",
        "required": ["role"],
        "properties": {"role": {"enum": ["user", "assistant", "tool"]},
                       "value": {"minimum": 0}},
        "translations": {"title": {"de": "Basis"}},
        "links": [{"rel": "self", "href": "{+base}"}],
    },
    "Mid.json": {
        "id": "Mid.json", "type": "object",
        "allOf": [{"$ref": "Base.json"}],
        "properties": {"text": {"minLength": 2}},
        "translations": {"title": {"fr": "Milieu"}},
    },
    "Child.json": {
        "id": "Child.json", "type": "object",
        "allOf": [{"$ref": "Mid.json"}],
        "properties": {"value": {"maximum": 100}},
    },
}

ROWS = [
    ("user", "hello", 5.0),        # valid
    ("narrator", "hello", 5.0),    # Base enum violated
    ("user", "x", 5.0),            # Mid minLength violated
    ("user", "hello", 150.0),      # Child maximum violated
    ("user", "hello", -3.0),       # Base minimum violated (same-key conjunction)
    (None, "hello", 5.0),          # Base required violated
    ("user", None, 50.0),          # null text: valid (null == absent)
]
SCHEMA = T.StructType([T.StructField("role", T.StringType()),
                       T.StructField("text", T.StringType()),
                       T.StructField("value", T.DoubleType())])


def _merged_spec() -> ConstraintSpec:
    return ConstraintSpec.merge_ancestors("Child.json", DOCS)


def test_merge_chain_root_first_and_rules_union():
    spec = _merged_spec()
    assert spec.doc["x-ancestors"] == ["Base.json", "Mid.json"]
    assert spec.schema_id == "Child.json"
    assert spec.required == ("role",)
    # same-key conjunction: value constrained by Base AND Child
    assert spec.properties["value"] == {"allOf": [{"minimum": 0}, {"maximum": 100}]}
    assert spec.properties["text"] == {"minLength": 2}
    # C21 translations merged across the chain
    assert spec.translations["title"] == {"de": "Basis", "fr": "Milieu"}
    assert spec.links and spec.links[0]["rel"] == "self"


def test_merged_engine_agrees_with_jsonschema_ref_store(spark):
    resolver = jsonschema.RefResolver(base_uri="", referrer=DOCS["Child.json"],
                                      store=DOCS)
    validator = jsonschema.Draft4Validator(DOCS["Child.json"], resolver=resolver)

    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = compile_spec(_merged_spec(), df.schema)
    ok_all = F.lit(True)
    for r in plan.row_rules:
        ok_all = ok_all & r.ok
    got = [bool(r["ok"]) for r in
           df.select(ok_all.alias("ok")).collect()]
    expected = [validator.is_valid({k: v for k, v in
                                    zip(("role", "text", "value"), row)
                                    if v is not None})
                for row in ROWS]
    assert got == expected


def test_merge_diamond_dedups_shared_ancestor():
    docs = {
        "Root.json": {"id": "Root.json", "type": "object",
                      "properties": {"v": {"minimum": 0}}},
        "A.json": {"id": "A.json", "type": "object",
                   "allOf": [{"$ref": "Root.json"}], "properties": {}},
        "B.json": {"id": "B.json", "type": "object",
                   "allOf": [{"$ref": "Root.json"}], "properties": {}},
        "Leaf.json": {"id": "Leaf.json", "type": "object",
                      "allOf": [{"$ref": "A.json"}, {"$ref": "B.json"}],
                      "properties": {}},
    }
    spec = ConstraintSpec.merge_ancestors("Leaf.json", docs)
    assert spec.doc["x-ancestors"] == ["Root.json", "A.json", "B.json"]
    # Root's subschema contributed once, not once per path
    assert spec.properties["v"] == {"minimum": 0}


def test_merge_cycle_is_safe():
    docs = {
        "A.json": {"id": "A.json", "type": "object",
                   "allOf": [{"$ref": "B.json"}],
                   "properties": {"x": {"minimum": 0}}},
        "B.json": {"id": "B.json", "type": "object",
                   "allOf": [{"$ref": "A.json"}],
                   "properties": {"y": {"maximum": 9}}},
    }
    spec = ConstraintSpec.merge_ancestors("A.json", docs)
    assert set(spec.properties) == {"x", "y"}


def test_merge_unresolved_ref_raises():
    with pytest.raises(KeyError, match="unresolved external"):
        ConstraintSpec.merge_ancestors(
            "A.json", {"A.json": {"id": "A.json", "type": "object",
                                  "allOf": [{"$ref": "Missing.json"}],
                                  "properties": {}}})


# ----------------------------------------------------------------- P13 ignore
def test_ignore_filter_skips_key_and_legacy_description(spark):
    doc = {
        "type": "object",
        "properties": {
            "role": {"enum": ["user"]},
            "text": {"pattern": "^NOPE$"},
            "value": {"description": "(legacy spelling; use amount)",
                      "maximum": -1},
        },
        "x-ignore-properties": ["text"],
    }
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    assert sorted(plan.ignored) == ["text", "value"]
    assert [r.rule_id for r in plan.row_rules] == ["role.enum"]


# ------------------------------------------------------------- C17 disjoint
def test_disjoint_rule_flags_only_joint_membership(spark):
    doc = {
        "type": "object", "properties": {},
        "x-disjoint": [{"id": "user_high",
                        "a": {"properties": {"role": {"enum": ["user"]}}},
                        "b": {"required": ["value"],
                              "properties": {"value": {"minimum": 100}}}}],
    }
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    rule = next(r for r in plan.row_rules if r.rule_id == "$.disjoint.user_high")
    bad = df.where(~rule.ok).select("role", "value").collect()
    assert [(r["role"], r["value"]) for r in bad] == [("user", 150.0)]


# --------------------------------------------------------- C20/C21 provenance
def test_violations_carry_schema_id_and_manifest_carries_meta(spark, tmp_path):
    from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator
    from owl2jsonschema_js_spark.runner import VIOLATION_COLUMNS, ValidationRunner

    doc = dict(DOCS["Base.json"])
    df = spark.createDataFrame(
        [("c1", 0, "user", 5.0), ("c1", 1, "narrator", 5.0),
         ("c2", 0, "tool", -1.0)],
        "conv_id string, turn_idx int, role string, value double")
    spec = ConstraintSpec.parse(doc)
    plan = compile_spec(spec, df.schema)
    res = ValidationRunner(plan, n_parts=2).run(df)
    assert tuple(res.violations.columns) == VIOLATION_COLUMNS
    ids = {r["schema_id"] for r in res.violations.select("schema_id").distinct().collect()}
    assert ids == {"Base.json"}
    assert res.spec_meta["translations"] == {"title": {"de": "Basis"}}
    assert res.spec_meta["links"][0]["rel"] == "self"

    m = Manifest.load(str(tmp_path / "m.json"))
    rv = ResumableValidator(plan, m, "snap-x", n_parts=2)
    rv.run(df)
    m2 = Manifest.load(str(tmp_path / "m.json"))
    assert spec.version in m2.meta["specs"]
    assert m2.meta["specs"][spec.version]["schema_id"] == "Base.json"


# ------------------------------------------- C19 emitted possibleRef shape
def test_possible_ref_shape_reduces_to_uri_check(spark):
    """The reference emits every class-valued property as
    ``oneOf:[{inline object}, {type:string, format:uri}]`` (possibleRef,
    lib/index.js:866-878). On a flat string column the object branch is
    statically false, so draft-4 exactly-one reduces to the uri-string
    check — the anyURI regex allows relative refs but rejects spaces."""
    doc = {
        "type": "object",
        "definitions": {"possibleRef": {"oneOf": [
            {"type": "object"},
            {"type": "string", "format": "uri"}]}},
        "properties": {"tool": {"$ref": "#/definitions/possibleRef"}},
    }
    df = spark.createDataFrame(
        [("http://example.com/t/3",), ("tool_3",), ("has spaces here",), (None,)],
        "tool string")
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    rule = next(r for r in plan.row_rules if r.rule_id == "tool.combinator")
    got = [bool(r["ok"]) for r in df.select(rule.ok.alias("ok")).collect()]
    assert got == [True, True, False, True]  # null == absent -> valid


# --------------------------------------------------- CLI directory workflow
def test_cli_constraints_directory_merges_ancestors(spark, tmp_path, capsys):
    """The reference-user workflow: point the CLI at a DIRECTORY of per-class
    schema files (the reference's OUTPUT layout) + --root; ancestor rules
    must fire on the data."""
    import json

    from owl2jsonschema_js_spark.__main__ import main

    ddir = tmp_path / "schemas"
    ddir.mkdir()
    for name, doc in DOCS.items():
        (ddir / name).write_text(json.dumps(doc))
    data = tmp_path / "t.parquet"
    spark.createDataFrame(
        [("c1", 0, "user", "hello", 5.0), ("c1", 1, "narrator", "hello", 5.0),
         ("c2", 0, "user", "x", 150.0)],
        "conv_id string, turn_idx int, role string, text string, value double",
    ).write.parquet(str(data))
    rc = main(["--input", str(data), "--constraints", str(ddir),
               "--root", "Child.json", "--n-parts", "2"])
    assert rc == 0
    blob = json.loads(capsys.readouterr().out)
    rules = {}
    for part in blob["verdicts"].values():
        for rid, n in part["rules"].items():
            rules[rid] = rules.get(rid, 0) + n
    # Base enum (narrator), Mid minLength ('x'), Child maximum (150) all fire
    assert rules.get("role.enum") == 1
    assert rules.get("text.length") == 1
    assert rules.get("value.combinator") == 1


# -------------------------------------------------- J5 equivalence resolution
def test_equivalent_class_unions_rule_sets():
    """owl:equivalentClass (J5): equivalence = identical class extension, so
    the equivalent doc's rules union in exactly like an ancestor's."""
    docs = {
        "Person.json": {"id": "Person.json", "type": "object",
                        "x-equivalent": ["Human.json"],
                        "properties": {"role": {"enum": ["user"]}}},
        "Human.json": {"id": "Human.json", "type": "object",
                       "required": ["text"],
                       "properties": {"value": {"minimum": 0}}},
    }
    spec = ConstraintSpec.merge_ancestors("Person.json", docs)
    assert spec.doc["x-ancestors"] == ["Human.json"]
    assert spec.required == ("text",)
    assert set(spec.properties) == {"role", "value"}


def test_mixed_inline_and_external_allof_entries(spark):
    """allOf mixing an external $ref (consumed by the walk) with an inline
    subschema (kept as a doc-level combinator) must compile both."""
    docs = {
        "Base.json": {"id": "Base.json", "type": "object",
                      "properties": {"value": {"minimum": 0}}},
        "Child.json": {"id": "Child.json", "type": "object",
                       "allOf": [{"$ref": "Base.json"},
                                 {"properties": {"role": {"enum": ["user"]}}}],
                       "properties": {}},
    }
    spec = ConstraintSpec.merge_ancestors("Child.json", docs)
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = compile_spec(spec, df.schema)
    rule_ids = sorted(r.rule_id for r in plan.row_rules)
    assert rule_ids == ["$.allOf", "value.range"]
    ok_all = F.lit(True)
    for r in plan.row_rules:
        ok_all = ok_all & r.ok
    got = [bool(r[0]) for r in df.select(ok_all).collect()]
    # rows: valid, narrator(enum fail), 'x'(ok here), 150(ok: no max), -3(min fail), None role(enum vacuous ok), None text ok
    assert got == [True, False, True, True, False, True, True]


def test_legacy_marker_survives_allof_fold(spark):
    """P13 must fire identically pre- and post-merge: an ancestor property
    carrying the legacy-spelling marker stays ignored even when the child's
    same-key subschema folds it into an allOf wrapper."""
    docs = {
        "Base.json": {"id": "Base.json", "type": "object", "properties": {
            "value": {"description": "(legacy spelling; use amount)",
                      "maximum": -1}}},
        "Child.json": {"id": "Child.json", "type": "object",
                       "allOf": [{"$ref": "Base.json"}],
                       "properties": {"value": {"maximum": 300}}},
    }
    spec = ConstraintSpec.merge_ancestors("Child.json", docs)
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = compile_spec(spec, df.schema)
    assert plan.ignored == ["value"]
    assert not plan.row_rules


def test_merge_rejects_cardinality_over_different_group_keys():
    docs = {
        "Base.json": {"id": "Base.json", "type": "object", "properties": {},
                      "x-table-constraints": {
                          "minItems": {"per": "conv_id", "value": 3}}},
        "Child.json": {"id": "Child.json", "type": "object",
                       "allOf": [{"$ref": "Base.json"}], "properties": {},
                       "x-table-constraints": {
                           "minItems": {"per": "user_id", "value": 5}}},
    }
    with pytest.raises(ValueError, match="different group keys"):
        ConstraintSpec.merge_ancestors("Child.json", docs)


def test_merge_rejects_conflicting_unique_referential_contiguous():
    """ADVICE r2: uniqueItems/referential/contiguous have no tightest-bound
    conjunction — a child silently replacing the ancestor's value would drop
    the ancestor's table constraint with no error. Differing values raise;
    identical re-declarations fold."""
    def mk(base_tc, child_tc):
        return {
            "Base.json": {"id": "Base.json", "type": "object", "properties": {},
                          "x-table-constraints": base_tc},
            "Child.json": {"id": "Child.json", "type": "object",
                           "allOf": [{"$ref": "Base.json"}], "properties": {},
                           "x-table-constraints": child_tc},
        }

    with pytest.raises(ValueError, match="uniqueItems"):
        ConstraintSpec.merge_ancestors("Child.json", mk(
            {"uniqueItems": ["conv_id", "turn_idx"]},
            {"uniqueItems": ["conv_id"]}))
    with pytest.raises(ValueError, match="referential"):
        ConstraintSpec.merge_ancestors("Child.json", mk(
            {"referential": {"column": "tool", "table": "cat", "key": "tool"}},
            {"referential": {"column": "role", "table": "cat", "key": "role"}}))
    with pytest.raises(ValueError, match="contiguous"):
        ConstraintSpec.merge_ancestors("Child.json", mk(
            {"contiguous": "conv_id"}, {"contiguous": "user_id"}))
    # identical re-declaration is a fold, not a conflict
    spec = ConstraintSpec.merge_ancestors("Child.json", mk(
        {"uniqueItems": ["conv_id", "turn_idx"]},
        {"uniqueItems": ["conv_id", "turn_idx"]}))
    assert spec.table.unique_keys == ("conv_id", "turn_idx")


def test_merge_rejects_same_name_definition_with_different_body():
    """ADVICE r2: dict.update on definitions would rebind the ancestor's
    #/definitions/<name> $refs to the child's version after the fold."""
    docs = {
        "Base.json": {"id": "Base.json", "type": "object",
                      "properties": {"v": {"$ref": "#/definitions/pos"}},
                      "definitions": {"pos": {"minimum": 0}}},
        "Child.json": {"id": "Child.json", "type": "object",
                       "allOf": [{"$ref": "Base.json"}], "properties": {},
                       "definitions": {"pos": {"minimum": 10}}},
    }
    with pytest.raises(ValueError, match="conflicting definition 'pos'"):
        ConstraintSpec.merge_ancestors("Child.json", docs)
    # identical bodies fold fine
    docs["Child.json"]["definitions"]["pos"] = {"minimum": 0}
    spec = ConstraintSpec.merge_ancestors("Child.json", docs)
    assert spec.definitions["pos"] == {"minimum": 0}


def test_required_respects_ignore_filter():
    """ADVICE r2 / P13: an ignored key never enters the reference's
    schema.properties and so can never be pushed into required
    (lib/index.js:913-916 vs 1077) — a skip-listed or legacy-marked key in
    `required` must not emit an isNotNull rule."""
    doc = {
        "type": "object",
        "required": ["props", "value", "role"],
        "properties": {
            "props": {"pattern": "^x$"},
            "value": {"description": "(legacy spelling; use amount)",
                      "maximum": -1},
            "role": {"type": "string"},
        },
        "x-ignore-properties": ["props"],
    }
    schema = T.StructType([
        T.StructField("props", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("role", T.StringType()),
    ])
    plan = compile_spec(ConstraintSpec.parse(doc), schema)
    ids = [r.rule_id for r in plan.row_rules]
    assert "role.required" in ids
    assert "props.required" not in ids and "value.required" not in ids
    assert not any(r.rule_id.startswith(("props.", "value.")) for r in plan.row_rules)
    assert sorted(plan.ignored) == ["props", "value"]  # recorded once each
