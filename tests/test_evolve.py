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
