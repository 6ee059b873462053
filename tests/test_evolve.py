"""Constraint evolution (evolve.py): delta revalidation must reproduce the
full new-version verdict exactly, per rule, per partition."""

from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.evolve import delta_plan, merge_verdicts, plan_diff
from owl2jsonschema_js_spark.runner import ValidationRunner
from owl2jsonschema_js_spark.spec import ConstraintSpec

V1 = {
    "id": "T.json", "type": "object",
    "required": ["text"],
    "properties": {"role": {"enum": ["user", "assistant", "system", "tool"]}},
    "x-table-constraints": {"uniqueItems": ["conv_id", "turn_idx"]},
}
V2 = {
    "id": "T.json", "type": "object",
    "required": ["text"],
    "properties": {"role": {"enum": ["user", "assistant", "system"]},  # changed
                   "turn_idx": {"minimum": 1}},                        # added
    "x-table-constraints": {"uniqueItems": ["conv_id", "turn_idx"]},   # same
}


def _df(spark, fixture60):
    return fixture60.to_spark(spark)


def test_diff_identifies_added_changed_and_noop(spark, fixture60):
    df = _df(spark, fixture60)
    p1 = compile_spec(ConstraintSpec.parse(V1), df.schema)
    p2 = compile_spec(ConstraintSpec.parse(V2), df.schema)
    d = plan_diff(p1, p2)
    assert d.added == ["turn_idx.range"]
    assert d.changed == ["role.enum"]
    assert d.removed == []
    assert not d.table_changed
    assert plan_diff(p1, compile_spec(ConstraintSpec.parse(V1), df.schema)).is_noop


def test_delta_revalidation_reproduces_full_new_verdict(spark, fixture60):
    df = _df(spark, fixture60)
    p1 = compile_spec(ConstraintSpec.parse(V1), df.schema)
    p2 = compile_spec(ConstraintSpec.parse(V2), df.schema)

    v1 = ValidationRunner(p1, n_parts=4).run(df).collect_verdicts()
    full_v2 = ValidationRunner(p2, n_parts=4).run(df).collect_verdicts()

    sub, d = delta_plan(p1, p2)
    assert sorted(r.rule_id for r in sub.row_rules) == ["role.enum", "turn_idx.range"]
    assert not sub.table.unique_keys  # table constraints unchanged -> not re-run
    dv = ValidationRunner(sub, n_parts=4).run(df).collect_verdicts()

    assert merge_verdicts(v1, dv, d) == full_v2


def test_delta_with_table_change_reruns_table_rules(spark, fixture60):
    df = _df(spark, fixture60)
    v2b = dict(V2)
    v2b["x-table-constraints"] = {
        "uniqueItems": ["conv_id", "turn_idx"],
        "minItems": {"per": "conv_id", "value": 3},
    }
    p1 = compile_spec(ConstraintSpec.parse(V1), df.schema)
    p2 = compile_spec(ConstraintSpec.parse(v2b), df.schema)
    sub, d = delta_plan(p1, p2)
    assert d.table_changed
    assert sub.table.min_items == 3 and sub.table.unique_keys

    v1 = ValidationRunner(p1, n_parts=4).run(df).collect_verdicts()
    full = ValidationRunner(p2, n_parts=4).run(df).collect_verdicts()
    dv = ValidationRunner(sub, n_parts=4).run(df).collect_verdicts()
    assert merge_verdicts(v1, dv, d) == full


def test_manifest_evolve_matches_from_scratch(spark, fixture60, tmp_path):
    """ResumableValidator.evolve: manifest entries recorded via delta
    revalidation must equal the entries a from-scratch new-version run
    records (same snapshot)."""
    from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator

    df = fixture60.to_spark(spark)
    p1 = compile_spec(ConstraintSpec.parse(V1), df.schema)
    p2 = compile_spec(ConstraintSpec.parse(V2), df.schema)
    mpath, spath = str(tmp_path / "evolved.json"), str(tmp_path / "scratch.json")

    ResumableValidator(p1, Manifest.load(mpath), "snap-1", n_parts=4).run(df)
    ResumableValidator(p2, Manifest.load(mpath), "snap-1", n_parts=4) \
        .evolve(df, old_plan=p1)
    ResumableValidator(p2, Manifest.load(spath), "snap-1", n_parts=4).run(df)

    v2 = p2.spec.version
    evolved = {k: v for k, v in Manifest.load(mpath).entries.items()
               if k.endswith(v2)}
    scratch = {k: v for k, v in Manifest.load(spath).entries.items()
               if k.endswith(v2)}
    assert evolved and evolved == scratch


def test_manifest_evolve_noop_diff_copies_verdicts(spark, fixture60, tmp_path):
    """A metadata-only doc edit (new version hash, identical rules) must
    upgrade the manifest by carrying verdicts over — no delta rules run."""
    from owl2jsonschema_js_spark.checkpoint import Manifest, ResumableValidator
    from owl2jsonschema_js_spark.evolve import plan_diff

    df = fixture60.to_spark(spark)
    v1b = dict(V1, title="renamed only")
    p1 = compile_spec(ConstraintSpec.parse(V1), df.schema)
    p1b = compile_spec(ConstraintSpec.parse(v1b), df.schema)
    assert p1.spec.version != p1b.spec.version
    assert plan_diff(p1, p1b).is_noop

    mpath = str(tmp_path / "m.json")
    ResumableValidator(p1, Manifest.load(mpath), "snap-1", n_parts=4).run(df)
    ResumableValidator(p1b, Manifest.load(mpath), "snap-1", n_parts=4) \
        .evolve(df, old_plan=p1)
    m = Manifest.load(mpath)
    old = {k.split("|")[1]: v for k, v in m.entries.items()
           if k.endswith(p1.spec.version)}
    new = {k.split("|")[1]: v for k, v in m.entries.items()
           if k.endswith(p1b.spec.version)}
    assert old and set(old) == set(new)
    for part in old:
        assert old[part]["verdict"] == new[part]["verdict"]
        assert old[part]["metrics"] == new[part]["metrics"]


def test_diff_stable_across_recompiles_for_hof_rules(spark):
    """exists/forall rules embed fresh lambda-variable ids per compile
    (x_1 vs x_2); the signature normalization must keep two compiles of the
    SAME doc a no-op diff."""
    from pyspark.sql import types as T

    doc = {"type": "object", "properties": {
        "types": {"type": "array", "additionalItems": False,
                  "items": {"allOf": [{"enum": ["a", "b"]}]}}}}
    schema = T.StructType([T.StructField("types", T.ArrayType(T.StringType()))])
    p1 = compile_spec(ConstraintSpec.parse(doc), schema)
    p2 = compile_spec(ConstraintSpec.parse(doc), schema)
    assert plan_diff(p1, p2).is_noop


def test_diff_distinguishes_columns_named_like_lambda_vars(spark):
    """ADVICE r2: a blanket x_<digits> rewrite conflated genuine columns named
    x_1/x_2 — two versions of the same rule referencing DIFFERENT x_<n>
    columns must diff as 'changed', not silently carry stale verdicts."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x_1", T.DoubleType()),
                           T.StructField("x_2", T.DoubleType())])
    v1 = {"type": "object", "properties": {},
          "anyOf": [{"required": ["x_1"]}]}
    v2 = {"type": "object", "properties": {},
          "anyOf": [{"required": ["x_2"]}]}
    p1 = compile_spec(ConstraintSpec.parse(v1), schema)
    p2 = compile_spec(ConstraintSpec.parse(v2), schema)
    d = plan_diff(p1, p2)
    assert d.changed == ["$.anyOf"]
    # and recompiling the same doc is still a no-op
    assert plan_diff(p1, compile_spec(ConstraintSpec.parse(v1), schema)).is_noop


def test_normalize_lambdas_anchors_to_declarations():
    """Only declared lambda variables are renumbered; an undeclared x_<n>
    token is a real column reference and keeps its identity. Nested lambdas
    get distinct positional numbers."""
    from owl2jsonschema_js_spark.evolve import _normalize_lambdas

    s = "forall(arr, x_1 -> >(x_1, x_3))"
    assert _normalize_lambdas(s) == "forall(arr, λ0 -> >(λ0, x_3))"
    nested = "transform(arr, x_2 -> aggregate(arr2, 0, (x_3, y_4) -> +(+(x_3, y_4), x_2)))"
    assert _normalize_lambdas(nested) == \
        "transform(arr, λ0 -> aggregate(arr2, 0, (λ1, λ2) -> +(+(λ1, λ2), λ0)))"
    # same expression compiled with different fresh ids normalizes identically
    other = "forall(arr, x_9 -> >(x_9, x_3))"
    assert _normalize_lambdas(other) == _normalize_lambdas(s)
