"""Golden end-to-end (SURVEY.md §5.2.3/5.2.4): seeded synthetic transcripts with
injected violations -> detected must equal injected, exactly, per rule; verdicts
attribute to the right partitions; the hot conversation doesn't change verdicts."""

from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import compile_spec
from owl2jsonschema_js_spark.docs import transcript_constraints
from owl2jsonschema_js_spark.runner import ValidationRunner
from owl2jsonschema_js_spark.spec import ConstraintSpec


def _run(spark, fixture60):
    df = fixture60.to_spark(spark)
    catalog = fixture60.catalog_spark(spark)
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    assert not plan.schema_issues
    runner = ValidationRunner(plan, n_parts=8)
    return runner.run(df, catalog=catalog), df


def test_detected_equals_injected(spark, fixture60):
    result, _ = _run(spark, fixture60)
    got = {
        r["rule_id"]: r["n"]
        for r in result.violations.groupBy("rule_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == fixture60.expected_counts()


def test_violation_rows_identify_injected_turns(spark, fixture60):
    result, _ = _run(spark, fixture60)
    got = {
        (r["rule_id"], r["conv_id"], r["turn_idx"])
        for r in result.violations.collect()
    }
    exp = {(v["rule_id"], v["conv_id"], v["turn_idx"]) for v in fixture60.expected}
    assert got == exp


def test_per_partition_verdicts(spark, fixture60):
    result, df = _run(spark, fixture60)
    verdicts = result.collect_verdicts()
    # every derived partition is present and row counts add up
    assert sum(v["n_rows"] for v in verdicts.values()) == df.count()
    n_bad_parts = sum(1 for v in verdicts.values() if not v["pass"])
    # injected violations live in 5 distinct conversations -> at most 5 bad parts
    assert 1 <= n_bad_parts <= 5
    total = sum(c for v in verdicts.values() for c in v["rules"].values())
    assert total == len(fixture60.expected)


def test_checked_ok_all_consistent(spark, fixture60):
    result, df = _run(spark, fixture60)
    # the small tool catalog folds referential into the row scan, so checked
    # carries ok__table_referential and ok_all covers it — referential IS
    # row-local once the catalog key set is a predicate
    assert "ok__table_referential" in result.checked.columns
    n_bad_rows = result.checked.where(~F.col("ok_all")).count()
    row_rule_ids = {"role.enum", "text.required", "table.referential"}
    exp_rows = sum(1 for v in fixture60.expected if v["rule_id"] in row_rule_ids)
    assert n_bad_rows == exp_rows


def test_clean_table_passes(spark):
    from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas

    fx = gen_transcripts_pandas(n_convs=10, seed=7)
    # strip the 5 violation conversations entirely
    bad_convs = {v["conv_id"] for v in fx.expected}
    pdf = fx.pdf[~fx.pdf.conv_id.isin(bad_convs)]
    df = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    res = ValidationRunner(plan, n_parts=4).run(df, catalog=fx.catalog_spark(spark))
    assert res.violations.count() == 0
    assert all(v["pass"] for v in res.collect_verdicts().values())


def test_hot_conversation_skew_same_verdicts(spark):
    """SURVEY.md §5.2.6: one hot conv (~30% of rows) must not change verdicts
    vs recomputing per-rule counts; exercises full-key uniqueness path."""
    from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas

    fx = gen_transcripts_pandas(n_convs=40, seed=11, hot_frac=0.30)
    df = fx.to_spark(spark)
    hot = df.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    assert hot["count"] / df.count() > 0.2  # skew fixture is real
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    res = ValidationRunner(plan, n_parts=8).run(df, catalog=fx.catalog_spark(spark))
    got = {
        r["rule_id"]: r["n"]
        for r in res.violations.groupBy("rule_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == fx.expected_counts()


def test_spark_native_generator_validates(spark):
    """The scale generator's clean rows pass; injected hash-rate violations are
    detected at the expected order of magnitude."""
    from owl2jsonschema_js_spark.datagen import gen_transcripts_spark, tool_catalog_spark

    df = gen_transcripts_spark(spark, n_rows=20_000, n_convs=500, violations_per_mille=2)
    spec = ConstraintSpec.parse(transcript_constraints())
    plan = compile_spec(spec, df.schema)
    res = ValidationRunner(plan, n_parts=8).run(df, catalog=tool_catalog_spark(spark))
    counts = {r["rule_id"]: r["n"] for r in
              res.violations.groupBy("rule_id").agg(F.count("*").alias("n")).collect()}
    assert 10 <= counts.get("role.enum", 0) <= 120      # ~2 per mille of 20k
    assert 10 <= counts.get("text.required", 0) <= 120
    assert counts.get("table.referential", 0) >= 1
    # contiguity holds by construction for all conversations
    assert "table.contiguity" not in counts
    assert "table.unique" not in counts


def test_uniqueness_strategies_agree(spark, fixture60):
    """'full' and 'gated' uniqueness must produce identical violation rows and
    verdicts — including the hot conversation and injected duplicates."""
    from owl2jsonschema_js_spark.compile import compile_spec
    from owl2jsonschema_js_spark.docs import transcript_constraints
    from owl2jsonschema_js_spark.runner import ValidationRunner
    from owl2jsonschema_js_spark.spec import ConstraintSpec

    df = fixture60.to_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
    cat = fixture60.catalog_spark(spark)

    def rows(strategy):
        res = ValidationRunner(plan, n_parts=4, uniqueness=strategy).run(df, catalog=cat)
        viol = sorted(map(tuple, res.violations.collect()))
        verd = res.collect_verdicts()
        return viol, verd

    full_v, full_d = rows("full")
    gated_v, gated_d = rows("gated")
    assert full_v == gated_v
    assert full_d == gated_d
    # the fixture really injects duplicates (the gate has something to find)
    assert any(r[1] == "table.unique" for r in full_v)


def test_referential_fold_memoized_per_catalog(spark, fixture60):
    """Round-4 (ADVICE r3): run()'s eager catalog key-set scan is memoized per
    catalog DataFrame object — repeated run() calls with the same catalog must
    not re-collect it."""
    df = fixture60.to_spark(spark)
    catalog = fixture60.catalog_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
    runner = ValidationRunner(plan, n_parts=4)

    calls = {"n": 0}
    orig_select = catalog.select

    def spy(*a, **k):
        calls["n"] += 1
        return orig_select(*a, **k)

    catalog.select = spy
    r1 = runner.run(df, catalog=catalog)
    assert calls["n"] == 1
    r2 = runner.run(df, catalog=catalog)
    assert calls["n"] == 1, "second run() re-collected the catalog"
    assert r1.violations.count() == r2.violations.count()
    del catalog.select  # restore the method for other consumers
    # a DIFFERENT catalog object misses the memo and is scanned fresh
    cat2 = fixture60.catalog_spark(spark)
    runner.run(df, catalog=cat2)
    assert runner._ref_fold_cache[0] is cat2


def test_referential_fold_cache_opt_out_recollects(spark, fixture60):
    """A DataFrame is a plan, not data: a catalog-table-backed object whose
    underlying rows mutate between run() calls would serve stale keys from
    the memo — cache_ref_catalog=False re-collects every run (round-4 review
    finding)."""
    df = fixture60.to_spark(spark)
    catalog = fixture60.catalog_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)
    runner = ValidationRunner(plan, n_parts=4, cache_ref_catalog=False)

    calls = {"n": 0}
    orig_select = catalog.select

    def spy(*a, **k):
        calls["n"] += 1
        return orig_select(*a, **k)

    catalog.select = spy
    runner.run(df, catalog=catalog)
    runner.run(df, catalog=catalog)
    del catalog.select
    assert calls["n"] == 2, "opt-out must re-collect the catalog per run"


def test_uniqueness_auto_consults_measured_profile(spark, fixture60):
    """Round-4 (SURVEY §4.2): with a measured skew profile, uniqueness='auto'
    is a row-count decision against the documented full/gated crossover —
    small corpus -> full (the shuffle is cheaper than the gate), corpus past
    AUTO_GATED_MIN_ROWS -> gated — with identical outputs either way."""
    from owl2jsonschema_js_spark.runner import AUTO_GATED_MIN_ROWS
    from owl2jsonschema_js_spark.skew import key_skew_profile

    df = fixture60.to_spark(spark)
    catalog = fixture60.catalog_spark(spark)
    plan = compile_spec(ConstraintSpec.parse(transcript_constraints()), df.schema)

    def run_with(profile):
        runner = ValidationRunner(plan, n_parts=4, uniqueness="auto",
                                  skew_profile=profile)
        res = runner.run(df, catalog=catalog)
        out = sorted(map(tuple, res.violations.collect()))
        res.unpersist()
        return runner.last_uniqueness, out

    small_prof = key_skew_profile(df, "conv_id")
    assert small_prof["n_rows"] < AUTO_GATED_MIN_ROWS
    strat_small, v_small = run_with(small_prof)
    assert strat_small == "full"

    big_prof = dict(small_prof, n_rows=10**12)
    strat_big, v_big = run_with(big_prof)
    assert strat_big == "gated"
    assert v_small == v_big

    # no profile: 'auto' keeps its structural round-3 meaning (gated when the
    # conversation agg already runs on the same key)
    strat_none, v_none = run_with(None)
    assert strat_none == "gated"
    assert v_none == v_small


def test_mismatched_unique_keys_raise(spark):
    """A spec declaring uniqueItems on a different column set than the
    runner's key_cols must fail LOUDLY — uniqueness always evaluates over
    key_cols, so accepting the mismatch would silently validate the wrong
    key (a false-negative trap)."""
    import pytest

    doc = {"type": "object", "properties": {},
           "x-table-constraints": {"uniqueItems": ["msg_id"]}}
    plan = compile_spec(ConstraintSpec.parse(doc), _SCHEMA_TYPES())
    with pytest.raises(ValueError, match="uniqueItems"):
        ValidationRunner(plan)
    # aligned single declarations still construct (order-insensitive)
    doc2 = {"type": "object", "properties": {},
            "x-table-constraints": {"uniqueItems": ["turn_idx", "conv_id"]}}
    ValidationRunner(compile_spec(ConstraintSpec.parse(doc2), _SCHEMA_TYPES()))


def _SCHEMA_TYPES():
    from pyspark.sql import types as T
    return T.StructType([T.StructField("conv_id", T.StringType()),
                         T.StructField("turn_idx", T.IntegerType())])


def test_gated_uniqueness_matches_full_on_null_conv_id(spark):
    """NULL-key parity between strategies: a duplicate (NULL, turn) key is
    one group to the full strategy's groupBy, and the gated lane's join must
    be null-SAFE to reach the same rows (a plain equality join drops them —
    NULL == NULL is false in SQL — silently diverging from 'full')."""
    doc = {"type": "object", "properties": {},
           "x-table-constraints": {
               "uniqueItems": ["conv_id", "turn_idx"],
               "minItems": {"per": "conv_id", "value": 1}}}
    rows = [(None, 5, "a"), (None, 5, "b"), ("c1", 0, "x"), ("c1", 0, "y"),
            ("c2", 0, "z")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)

    def dups(strategy):
        res = ValidationRunner(plan, n_parts=4, uniqueness=strategy).run(df)
        out = sorted(((r["conv_id"], r["turn_idx"]) for r in
                      res.violations.where("rule_id = 'table.unique'").collect()),
                     key=lambda t: (t[0] is not None, t[0] or "", t[1]))
        res.unpersist()
        return out

    full, gated = dups("full"), dups("gated")
    assert full == gated == [(None, 5), (None, 5), ("c1", 0), ("c1", 0)]
