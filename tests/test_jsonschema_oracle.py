"""Independent second oracle (SURVEY.md §5.2.2): python-jsonschema (draft 4)
run row-wise must agree with the engine's vectorized row-rule verdicts.

Null mapping: SQL NULL == absent property (the engine's documented semantics),
so None-valued keys are dropped from the dict before jsonschema validation —
then `required` is the only keyword that can fire on them, exactly as in the
engine."""

import jsonschema
import pytest
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.docs import transcript_constraints
from owl2jsonschema_js_spark.runner import ValidationRunner
from owl2jsonschema_js_spark.spec import ConstraintSpec


def _doc_for_jsonschema() -> dict:
    doc = {k: v for k, v in transcript_constraints().items()
           if k not in ("x-table-constraints",)}
    return doc


def _row_to_instance(row) -> dict:
    inst = {}
    for k, v in row.asDict().items():
        if v is None:
            continue
        if k == "ts":
            v = v.isoformat()
        elif k == "turn_idx":
            v = int(v)
        inst[k] = v
    return inst


def test_rowwise_jsonschema_agrees_with_vectorized(spark, fixture60):
    doc = _doc_for_jsonschema()
    validator = jsonschema.Draft4Validator(doc)

    df = fixture60.to_spark(spark)
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    runner = ValidationRunner(plan, n_parts=4)
    checked = runner._row_checked(runner._with_partition(df))
    rows = checked.collect()

    mismatches = []
    for r in rows:
        base = {k: r[k] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

        class _R:
            def asDict(self_inner):
                return base

        expected = validator.is_valid(_row_to_instance(_R()))
        got = bool(r["ok_all"])
        if expected != got:
            mismatches.append((r["conv_id"], r["turn_idx"], expected, got))
    assert not mismatches, f"vectorized != jsonschema on {mismatches[:5]}"


@pytest.mark.parametrize("frag,value,dtype", [
    ({"enum": ["a", "b"]}, "c", "string"),
    ({"pattern": "^x+$"}, "xxy", "string"),
    ({"minimum": 3, "exclusiveMinimum": True}, 3, "integer"),
    ({"maximum": 3}, 4, "integer"),
    ({"oneOf": [{"minimum": 0}, {"maximum": 10}]}, 5, "integer"),
    ({"allOf": [{"minimum": 0}, {"maximum": 3}]}, 2, "integer"),
    ({"not": {"enum": ["z"]}}, "z", "string"),
    ({"minLength": 2, "maxLength": 3}, "abcd", "string"),
])
def test_keyword_fragments_agree_with_jsonschema(spark, frag, value, dtype):
    from pyspark.sql import types as T

    from owl2jsonschema_js_spark.compile import compile_schema

    doc = {"type": "object", "properties": {"v": frag}}
    expected = jsonschema.Draft4Validator(doc).is_valid({"v": value})

    st = T.StringType() if dtype == "string" else T.IntegerType()
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("v", st)]))
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    pred = compile_schema(frag, F.col("v"), st, spec)
    got = df.select(F.coalesce(pred, F.lit(False))).first()[0]
    assert got == expected, f"{frag} on {value!r}: engine={got} jsonschema={expected}"
