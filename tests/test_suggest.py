"""Constraint bootstrapping (suggest.py): the proposed doc is a sound
observation of the profiled data (revalidating the same snapshot yields ZERO
violations) and a real constraint for the next increment (planted drift is
caught with the right rule ids)."""

import json

from pyspark.sql import functions as F

from owl2jsonschema_js_spark import ConstraintSpec, ValidationRunner, compile_spec
from owl2jsonschema_js_spark.datagen import gen_transcripts_pandas
from owl2jsonschema_js_spark.suggest import suggest_constraints


def _fixture(spark):
    return gen_transcripts_pandas(n_convs=40, seed=7).to_spark(spark)


def test_suggested_doc_revalidates_clean(spark):
    """Every suggested keyword is an observed fact, so the engine's own
    compile+run over the SAME data must report zero violations."""
    df = _fixture(spark)
    doc = suggest_constraints(df, columns=["conv_id", "turn_idx", "role", "text"])
    json.dumps(doc, sort_keys=True)  # canonical + serializable
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    res = ValidationRunner(plan).run(df)
    assert res.violations.count() == 0
    assert all(v["pass"] for v in res.collect_verdicts().values())


def test_suggested_doc_catches_planted_drift(spark):
    df = _fixture(spark)
    doc = suggest_constraints(df, columns=["conv_id", "turn_idx", "role", "text"])
    assert "enum" in doc["properties"]["role"]          # low-cardinality
    assert "enum" not in doc["properties"].get("text", {})
    assert "conv_id" in doc["required"]
    plan_schema = df.schema
    plan = compile_spec(ConstraintSpec.parse(doc), plan_schema)

    drifted = df.unionByName(spark.createDataFrame(
        [("zz-new", 99999, "intruder_role", None, "t0",
          df.select("ts").first()["ts"])],
        df.schema))
    res = ValidationRunner(plan).run(drifted)
    got = {r["rule_id"] for r in res.violations.collect()}
    assert "role.enum" in got                           # new enum value
    assert "turn_idx.range" in got                      # out of observed range
    assert "conv_id.length" in got                      # new id shape
    # the fixture's text column has one observed NULL, so the suggester
    # correctly did NOT mark it required — the drifted row's NULL text is
    # legal under the bootstrapped spec
    assert "text" not in doc["required"]


def test_enum_bound_and_determinism(spark):
    df = _fixture(spark)
    a = suggest_constraints(df, columns=["role", "text"], enum_max=2)
    # role has more than 2 distinct values -> falls back to length bounds
    assert "enum" not in a["properties"]["role"]
    assert "minLength" in a["properties"]["role"]
    b = suggest_constraints(df, columns=["role", "text"], enum_max=2)
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)


def test_provenance_and_empty_columns_raise(spark):
    import pytest

    df = _fixture(spark)
    doc = suggest_constraints(df, columns=["role"])
    assert doc["x-suggested-from"]["n_rows"] == df.count()
    assert doc["x-suggested-from"]["null_counts"]["role"] == 0
    with pytest.raises(ValueError):
        suggest_constraints(df.select(), columns=[])


def test_cli_suggest_then_validate_roundtrip(spark, tmp_path, capsys):
    """spark-submit loop: --suggest writes a doc, the next run validates
    with it — clean on the same snapshot."""
    from owl2jsonschema_js_spark.__main__ import main

    src = str(tmp_path / "src")
    _fixture(spark).write.parquet(src)
    doc_path = str(tmp_path / "suggested.json")
    assert main(["--input", src, "--suggest", doc_path,
                 "--suggest-columns", "conv_id,turn_idx,role,text"]) == 0
    capsys.readouterr()
    with open(doc_path) as f:
        doc = json.load(f)
    assert doc["properties"]["role"].get("enum")
    assert "snapshot_id" in doc["x-suggested-from"]

    out = str(tmp_path / "out")
    assert main(["--input", src, "--constraints", doc_path,
                 "--output", out]) == 0
    verdicts = json.loads(capsys.readouterr().out)
    assert all(v["pass"] for v in verdicts["verdicts"].values())

    import pytest
    with pytest.raises(SystemExit):   # both modes at once
        main(["--input", src, "--constraints", doc_path,
              "--suggest", doc_path])
    with pytest.raises(SystemExit):   # neither mode
        main(["--input", src])


def test_cli_key_cols_validates_non_transcript_table(spark, tmp_path, capsys):
    """--key-cols frees the CLI from the transcripts key: suggest + validate
    a documents-shaped table keyed on doc_id."""
    from owl2jsonschema_js_spark.__main__ import main

    src = "/root/testdata/sf0.001/documents.parquet"
    doc_path = str(tmp_path / "docdoc.json")
    assert main(["--input", src, "--suggest", doc_path,
                 "--suggest-columns", "doc_id,lang,source,n_chars"]) == 0
    capsys.readouterr()
    assert main(["--input", src, "--constraints", doc_path,
                 "--key-cols", "doc_id,lang"]) == 0
    verdicts = json.loads(capsys.readouterr().out)
    assert all(v["pass"] for v in verdicts["verdicts"].values())

    import pytest
    with pytest.raises(SystemExit):   # duplicate key cols
        main(["--input", src, "--constraints", doc_path,
              "--key-cols", "doc_id,doc_id"])
    with pytest.raises(SystemExit):   # unknown key col
        main(["--input", src, "--constraints", doc_path,
              "--key-cols", "doc_id,nope"])


def test_table_rules_from_clean_key(spark):
    """key_cols on observed-clean data proposes uniqueItems + contiguous +
    the group-size band; the engine revalidates the SAME data clean with a
    matching runner key."""
    clean = spark.sql("""
        SELECT concat('c', CAST(id % 20 AS STRING)) AS conv_id,
               CAST(id DIV 20 AS INT) AS turn_idx,
               'user' AS role, 'hello world' AS text
        FROM range(0, 200)""")
    doc = suggest_constraints(clean, columns=["conv_id", "turn_idx", "role"],
                              key_cols=("conv_id", "turn_idx"))
    tc = doc["x-table-constraints"]
    assert tc["uniqueItems"] == ["conv_id", "turn_idx"]
    assert tc["contiguous"] == "conv_id"
    assert tc["minItems"] == {"per": "conv_id", "value": 10}
    assert tc["maxItems"] == {"per": "conv_id", "value": 10}
    plan = compile_spec(ConstraintSpec.parse(doc), clean.schema)
    res = ValidationRunner(plan).run(clean)
    assert res.violations.count() == 0

    # a duplicated + gapped increment trips the bootstrapped table rules
    bad = clean.unionByName(spark.createDataFrame(
        [("c0", 0, "user", "hello world"), ("c99", 5, "user", "hi")],
        clean.schema))
    got = {r["rule_id"] for r in
           ValidationRunner(plan).run(bad).violations.collect()}
    assert "table.unique" in got and "table.contiguity" in got
    assert "table.cardinality" in got          # c99 has 1 < minItems 10


def test_table_rules_self_gate_on_observed_violations(spark):
    """The transcript fixture carries injected duplicates/gaps — the
    suggester must NOT propose rules the data itself breaks (revalidation
    stays clean), while the observed group-size band still rides."""
    df = _fixture(spark)
    doc = suggest_constraints(df, columns=["conv_id", "turn_idx", "role"],
                              key_cols=("conv_id", "turn_idx"))
    tc = doc["x-table-constraints"]
    assert "uniqueItems" not in tc             # fixture plants duplicates
    assert "contiguous" not in tc              # fixture plants a gap
    assert tc["minItems"]["per"] == "conv_id"
    plan = compile_spec(ConstraintSpec.parse(doc), df.schema)
    assert ValidationRunner(plan).run(df).violations.count() == 0


def test_string_seq_key_skips_contiguity(spark):
    """A string second key column must not trip an int cast in the
    contiguity probe — uniqueness and the size band still propose."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc = suggest_constraints(docs, columns=["doc_id", "lang"],
                              key_cols=("doc_id", "lang"))
    tc = doc["x-table-constraints"]
    assert tc["uniqueItems"] == ["doc_id", "lang"]
    assert "contiguous" not in tc
    assert tc["minItems"] == {"per": "doc_id", "value": 1}
