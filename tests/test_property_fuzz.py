"""Property-style tests (SURVEY.md §5.2.4) + hypothesis fuzz of the compiler.

1. Across seeds: injected violation counts == detected counts, exactly.
2. Hypothesis: random draft-4 fragments (types/bounds/enum/combinators — the
   regex-free subset, since Java and Python regex dialects differ at the
   edges) evaluated by the engine on random scalar values must agree with
   python-jsonschema draft-4 row-wise.
"""

import json

import jsonschema
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from owl2jsonschema_js_spark.compile import compile_schema
from owl2jsonschema_js_spark.spec import ConstraintSpec


@pytest.mark.parametrize("seed", [1, 7, 99, 1234])
def test_injected_equals_detected_across_seeds(spark, seed):
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
    from owl2jsonschema_js_spark.docs import transcript_constraints
    from owl2jsonschema_js_spark.runner import ValidationRunner

    fx = gen_transcripts_pandas(n_convs=25, seed=seed)
    df = fx.to_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
    res = ValidationRunner(plan, n_parts=4).run(df, catalog=fx.catalog_spark(spark))
    got = {r["rule_id"]: r["n"] for r in
           res.violations.groupBy("rule_id").agg(F.count("*").alias("n")).collect()}
    assert got == fx.expected_counts()


# ---------------------------------------------------------------- hypothesis
_numeric_frag = st.fixed_dictionaries(
    {},
    optional={
        "minimum": st.integers(-20, 20),
        "maximum": st.integers(-20, 20),
        "exclusiveMinimum": st.booleans(),
        "exclusiveMaximum": st.booleans(),
        "type": st.just("integer"),
    },
)


def _clean(frag: dict) -> dict:
    # draft-4: exclusive* are only valid alongside minimum/maximum
    frag = dict(frag)
    if "exclusiveMinimum" in frag and "minimum" not in frag:
        del frag["exclusiveMinimum"]
    if "exclusiveMaximum" in frag and "maximum" not in frag:
        del frag["exclusiveMaximum"]
    return frag


_comb_frag = st.recursive(
    _numeric_frag.map(_clean),
    lambda inner: st.one_of(
        st.fixed_dictionaries({"allOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"anyOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"oneOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"not": inner}),
    ),
    max_leaves=6,
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frag=_comb_frag, values=st.lists(st.integers(-25, 25), min_size=1, max_size=8))
def test_fuzz_combinators_agree_with_jsonschema(spark, frag, values):
    validator = jsonschema.Draft4Validator(
        {"type": "object", "properties": {"v": frag}})
    expected = [validator.is_valid({"v": v}) for v in values]

    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", T.IntegerType())]))
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    pred = compile_schema(frag, F.col("v"), T.IntegerType(), spec)
    got = [r[0] for r in df.select(F.coalesce(pred, F.lit(False))).collect()]
    assert got == expected, f"frag={json.dumps(frag)} values={values}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(members=st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                        min_size=1, max_size=5, unique=True),
       values=st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                       min_size=1, max_size=6))
def test_fuzz_enum_agrees_with_jsonschema(spark, members, values):
    frag = {"enum": members}
    validator = jsonschema.Draft4Validator({"type": "object", "properties": {"v": frag}})
    expected = [validator.is_valid({"v": v}) for v in values]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    pred = compile_schema(frag, F.col("v"), T.StringType(), spec)
    got = [r[0] for r in df.select(F.coalesce(pred, F.lit(False))).collect()]
    assert got == expected


_string_frag = st.fixed_dictionaries(
    {},
    optional={
        "minLength": st.integers(0, 6),
        "maxLength": st.integers(0, 8),
        "enum": st.lists(st.text(alphabet="abc", max_size=3), min_size=1,
                         max_size=4, unique=True),
        "type": st.just("string"),
    },
)

_str_comb_frag = st.recursive(
    _string_frag,
    lambda inner: st.one_of(
        st.fixed_dictionaries({"allOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"anyOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"oneOf": st.lists(inner, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"not": inner}),
    ),
    max_leaves=6,
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frag=_str_comb_frag,
       values=st.lists(st.text(alphabet="abcd", max_size=8), min_size=1, max_size=8))
def test_fuzz_string_keywords_agree_with_jsonschema(spark, frag, values):
    """enum / minLength / maxLength under arbitrary combinator nesting must
    match python-jsonschema draft-4 row-wise (regex-free subset)."""
    validator = jsonschema.Draft4Validator(
        {"type": "object", "properties": {"v": frag}})
    expected = [validator.is_valid({"v": v}) for v in values]

    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", T.StringType())]))
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    pred = compile_schema(frag, F.col("v"), T.StringType(), spec)
    got = [r[0] for r in df.select(F.coalesce(pred, F.lit(False))).collect()]
    assert got == expected, f"frag={json.dumps(frag)} values={values}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frags=st.lists(_numeric_frag.map(_clean), min_size=2, max_size=4),
       values=st.lists(st.one_of(st.integers(-25, 25), st.none()),
                       min_size=1, max_size=6))
def test_fuzz_inheritance_chain_agrees_with_jsonschema(spark, frags, values):
    """Random linear allOf:[{$ref}] chains (the reference's subclass
    emission) merged by ConstraintSpec.merge_ancestors must agree with
    python-jsonschema resolving the same refs natively — i.e. the compile-time
    fold is semantically exactly `validate against every doc in the chain`."""
    from owl2jsonschema_js_spark.compile import compile_spec

    docs = {}
    for i, fr in enumerate(frags):
        doc = {"id": f"D{i}.json", "type": "object", "properties": {"v": fr}}
        if i > 0:
            doc["allOf"] = [{"$ref": f"D{i - 1}.json"}]
        docs[f"D{i}.json"] = doc
    child_id = f"D{len(frags) - 1}.json"
    resolver = jsonschema.RefResolver(base_uri="", referrer=docs[child_id],
                                      store=docs)
    validator = jsonschema.Draft4Validator(docs[child_id], resolver=resolver)
    expected = [validator.is_valid({} if v is None else {"v": v})
                for v in values]

    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", T.IntegerType())]))
    plan = compile_spec(ConstraintSpec.merge_ancestors(child_id, docs), df.schema)
    ok = F.lit(True)
    for r in plan.row_rules:
        ok = ok & r.ok
    got = [bool(r[0]) for r in df.select(ok).collect()]
    assert got == expected, f"chain={json.dumps(frags)} values={values}"


# ------------------------------------------------- round-5 parity kernels
# hostile-text alphabet: ASCII words + every Java-\s whitespace char + the
# unicode spaces Java/RE2 \s does NOT match (NBSP, EM SPACE) — the exact
# characters where python .split() and the engine's tokenizer could fork
_HOSTILE_TEXT = st.text(
    alphabet=st.sampled_from(list("abWX12.,!") + [" ", "\t", "\n", "\r",
                                                  "\x0b", "\x0c",
                                                  "\xa0", " "]),
    min_size=0, max_size=60)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_HOSTILE_TEXT, min_size=1, max_size=8),
       n=st.integers(1, 4))
def test_fuzz_arrow_ngrams_equal_expression_form(spark, texts, n):
    """distinct_ngrams_udf (Arrow hot path) and ngrams_col (Catalyst
    expression form, which the DuckDB oracles mirror) must tokenize
    identically on arbitrary whitespace-hostile text — any fork here would
    silently skew decontamination counts."""
    from owl2jsonschema_js_spark.operators.curation import (
        distinct_ngrams_udf, ngrams_col)

    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    both = df.select(
        F.array_sort(distinct_ngrams_udf(n)(F.col("text"))).alias("arrow"),
        F.array_sort(F.array_distinct(ngrams_col("text", n))).alias("expr"))
    for r in both.collect():
        assert r["arrow"] == r["expr"], texts


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.text(alphabet=st.characters(min_codepoint=1,
                                                    max_codepoint=0x2FF),
                             min_size=0, max_size=24),
                     min_size=1, max_size=8))
def test_fuzz_poly_fold_matches_python_reference(spark, keys):
    """poly_fold (the string-key lane of the LCG sampler and the simhash
    oracle hash) == the plain-arithmetic reference fold, char for char —
    the property that makes sampled row SETS reproducible in external SQL."""
    from owl2jsonschema_js_spark.operators.dedup import POLY_B1, POLY_M1, poly_fold

    def ref(s: str) -> int:
        acc = 0
        for ch in (s or "\x00"):  # empty string folds one zero char
            acc = (acc * POLY_B1 + ord(ch)) % POLY_M1
        return acc

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = [r[0] for r in df.select(poly_fold(F.col("k"))).collect()]
    assert got == [ref(k) for k in keys], keys


def test_exact_k_matches_bruteforce_on_random_corpora(spark):
    """Property check: for random small corpora and random k, the selected
    set equals the brute-force 'k smallest LCG values per stratum, ties by
    key' reference — including strata smaller than k."""
    import random

    from owl2jsonschema_js_spark.operators.curation import (
        _LCG_A, _LCG_C, _LCG_M, hash_sample_exact_k)

    rng = random.Random(20260819)
    for trial in range(4):
        n = rng.randint(5, 120)
        n_strata = rng.randint(1, 5)
        k = rng.randint(1, 12)
        ids = rng.sample(range(-500, 2000), n)
        rows = [(i, f"s{rng.randrange(n_strata)}") for i in ids]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = sorted(r["doc_id"] for r in
                     hash_sample_exact_k(df, k, stratum_col="source").collect())

        def u(i):
            return ((i % _LCG_M + _LCG_M) % _LCG_M * _LCG_A + _LCG_C) % _LCG_M

        want = []
        by = {}
        for i, s in rows:
            by.setdefault(s, []).append(i)
        for s, members in by.items():
            members.sort(key=lambda i: (u(i), i))
            want.extend(members[:k])
        assert got == sorted(want), (trial, n, n_strata, k)
