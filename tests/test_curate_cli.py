"""Curation CLI (`python -m owl2jsonschema_js_spark.curate`): each command
runs in-process against the driver corpus and writes checkable parquet."""

import json

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, argv):
    from owl2jsonschema_js_spark.curate import main

    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_sample_and_pack(spark, tmp_path, capsys):
    out = str(tmp_path / "s")
    s = _run(capsys, ["sample", "--input", SF, "--output", out, "--rate", "0.25"])
    assert 0 < s["kept"] < s["docs_in"]
    kept = spark.read.parquet(out)
    assert kept.count() == s["kept"]

    out2 = str(tmp_path / "p")
    p = _run(capsys, ["pack", "--input", SF, "--output", out2,
                      "--budget", "2000"])
    assert p["shards"] > 1
    packed = spark.read.parquet(out2)
    assert packed.count() == p["docs_in"]


def test_cli_stratified_sample(spark, tmp_path, capsys):
    out = str(tmp_path / "s2")
    s = _run(capsys, ["sample", "--input", SF, "--output", out,
                      "--rates", "src0=1.0,src1=0.0"])
    kept = spark.read.parquet(out)
    srcs = {r["source"] for r in kept.select("source").distinct().collect()}
    assert srcs == {"src0"} and s["kept"] == 25


def test_cli_pii_scan_and_redact(spark, tmp_path, capsys):
    out = str(tmp_path / "pii")
    s = _run(capsys, ["pii", "--input", SF, "--output", out])
    assert s["pii_hits"] == 0          # synthetic corpus carries no PII
    out2 = str(tmp_path / "red")
    s2 = _run(capsys, ["pii", "--input", SF, "--output", out2, "--redact"])
    assert s2["redacted"] is True
    red = spark.read.parquet(out2)
    assert red.count() == s2["docs_in"]
    assert set(red.columns) == set(spark.read.parquet(SF).columns)


def test_cli_dedup_and_decontaminate(spark, tmp_path, capsys):
    out = str(tmp_path / "d")
    s = _run(capsys, ["dedup", "--input", SF, "--output", out,
                      "--threshold", "0.7"])
    assert s["survivors"] + s["dropped"] == s["docs_in"]
    assert s["dropped"] > 0            # the corpus plants near-dups

    evals = str(tmp_path / "evals.parquet")
    spark.read.parquet(SF).where("doc_id % 97 = 0") \
        .selectExpr("doc_id as eval_id", "text").write.parquet(evals)
    out2 = str(tmp_path / "dc")
    s2 = _run(capsys, ["decontaminate", "--input", SF, "--output", out2,
                       "--eval", evals])
    assert s2["contaminated_docs"] >= 6  # at least the eval docs themselves
    out3 = str(tmp_path / "dcs")
    s3 = _run(capsys, ["decontaminate", "--input", SF, "--output", out3,
                       "--eval", evals, "--min-len", "60"])
    assert s3["hit_rows"] >= 6


def test_cli_substring_spans_and_survivors(spark, tmp_path, capsys):
    out = str(tmp_path / "sp")
    s = _run(capsys, ["substring", "--input", SF, "--output", out,
                      "--min-len", "60"])
    assert s["spans"] > 0
    out2 = str(tmp_path / "sv")
    s2 = _run(capsys, ["substring", "--input", SF, "--output", out2,
                       "--min-len", "60", "--min-coverage", "0.5"])
    assert s2["survivors"] + s2["dropped"] == s2["docs_in"]
    assert s2["dropped"] > 0  # corpus near-dups exceed 50% span coverage


def test_cli_split(spark, tmp_path, capsys):
    out = str(tmp_path / "split")
    s = _run(capsys, ["split", "--input", SF, "--output", out,
                      "--test-frac", "0.2"])
    assert s["test"] + s["train"] == s["docs_in"] and s["test"] > 0
    side = {r["doc_id"]: r["split"] for r in
            spark.read.parquet(out).select("doc_id", "split").collect()}
    from owl2jsonschema_js_spark.operators.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(spark.read.parquet(SF), threshold=0.7).collect()
    assert pairs and all(side[r["a_id"]] == side[r["b_id"]] for r in pairs)


def test_cli_sample_and_split_on_string_ids(spark, tmp_path, capsys):
    """The real-transcript-corpus shape: conv_id-style STRING doc ids through
    the spark-submit surface. Before the round-5 key guard this silently
    produced an empty sample and an all-train split."""
    src = str(tmp_path / "strdocs.parquet")
    spark.read.parquet(SF) \
        .selectExpr("concat('conv-', cast(doc_id as string)) AS doc_id",
                    "text", "source") \
        .write.parquet(src)

    out = str(tmp_path / "ssample")
    s = _run(capsys, ["sample", "--input", src, "--output", out,
                      "--rate", "0.3"])
    assert 0 < s["kept"] < s["docs_in"], "string-keyed sample must be nonempty"

    out2 = str(tmp_path / "ssplit")
    s2 = _run(capsys, ["split", "--input", src, "--output", out2,
                       "--test-frac", "0.2"])
    assert s2["test"] + s2["train"] == s2["docs_in"]
    assert s2["test"] > 0 and s2["train"] > 0, \
        "string-keyed split must populate both sides"
    side = {r["doc_id"]: r["split"] for r in
            spark.read.parquet(out2).select("doc_id", "split").collect()}
    from owl2jsonschema_js_spark.operators.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(spark.read.parquet(src), threshold=0.7).collect()
    assert pairs and all(side[r["a_id"]] == side[r["b_id"]] for r in pairs)


def test_cli_ann_build_grow_query(spark, tmp_path, capsys):
    """Persisted-IVF CLI lifecycle: build on half the vectors, grow with the
    other half (replay-idempotent), then batched query at full probe returns
    k ranked rows per query with each query's own vector ranked first."""
    emb_src = "/root/testdata/sf0.001/embeddings.parquet"
    half = str(tmp_path / "half.parquet")
    rest = str(tmp_path / "rest.parquet")
    emb = spark.read.parquet(emb_src).select("vec_id", "embedding")
    emb.where("vec_id % 2 = 0").write.parquet(half)
    emb.where("vec_id % 2 = 1").write.parquet(rest)
    idx = str(tmp_path / "ivf")

    s = _run(capsys, ["ann-build", "--input", half, "--index", idx,
                      "--n-centroids", "8"])
    assert s["n_vectors"] == s["vectors_in"] > 0
    s2 = _run(capsys, ["ann-query", "--index", idx, "--queries", half,
                       "--output", str(tmp_path / "q0"), "--k", "1",
                       "--nprobe", "8"])
    assert s2["rows"] == s2["n_queries"]

    g = _run(capsys, ["ann-build", "--input", rest, "--index", idx, "--grow"])
    assert g["appended"] > 0
    g2 = _run(capsys, ["ann-build", "--input", rest, "--index", idx, "--grow"])
    assert g2["appended"] == 0  # replayed grow is a no-op

    queries = str(tmp_path / "queries.parquet")
    # deliberately NOT 0..M-1: the output must carry the REAL query ids
    # (query_vec_id), not the batch position — ids 10/21/32 would silently
    # mislabel under positional ids since 0/1/2 also exist in the corpus
    emb.where("vec_id in (10, 21, 32)").write.parquet(queries)
    out = str(tmp_path / "topk")
    s3 = _run(capsys, ["ann-query", "--index", idx, "--queries", queries,
                       "--output", out, "--k", "3", "--nprobe", "8"])
    assert s3["rows"] == 9
    top = spark.read.parquet(out)
    rank1 = {r["query_vec_id"]: r["vec_id"]
             for r in top.where("rank = 1").collect()}
    assert rank1 == {10: 10, 21: 21, 32: 32}  # full probe: self is nearest


def test_cli_rejects_rate_conflicts(tmp_path, capsys):
    from owl2jsonschema_js_spark.curate import main

    with pytest.raises(SystemExit):
        main(["sample", "--input", SF, "--output", str(tmp_path / "x")])
    with pytest.raises(SystemExit):
        main(["sample", "--input", SF, "--output", str(tmp_path / "y"),
              "--rate", "0.5", "--rates", "src0=1.0"])


def test_cli_profile_increments_and_idempotent_epochs(spark, tmp_path, capsys):
    """profile: epoch 0 over half the corpus, epoch 1 over the rest — the
    second summary reports the MERGED corpus (n exact, estimates in bound);
    re-running epoch 1 rewrites its slot and changes nothing."""
    import duckdb

    half = str(tmp_path / "half")
    rest = str(tmp_path / "rest")
    docs = spark.read.parquet(SF)
    docs.where("doc_id % 2 = 0").write.parquet(half)
    docs.where("doc_id % 2 = 1").write.parquet(rest)
    store = str(tmp_path / "prof")

    s0 = _run(capsys, ["profile", "--input", half, "--output", store,
                       "--columns", "lang,source", "--epoch", "0"])
    s1 = _run(capsys, ["profile", "--input", rest, "--output", store,
                       "--columns", "lang,source", "--epoch", "1"])
    n_all = docs.count()
    assert s0["columns"]["lang"]["n"] + s1["rows_in"] == n_all
    assert s1["columns"]["lang"]["n"] == n_all        # merged across epochs
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT source) FROM read_parquet('{SF}')"
    ).fetchone()[0]
    got = s1["columns"]["source"]["distinct_est"]
    assert abs(got - exact) <= max(2, 0.05 * exact)

    s1b = _run(capsys, ["profile", "--input", rest, "--output", store,
                        "--columns", "lang,source", "--epoch", "1"])
    assert s1b["columns"] == s1["columns"]            # replay: no double-count

    with pytest.raises(SystemExit):                   # unknown column is loud
        from owl2jsonschema_js_spark.curate import main
        main(["profile", "--input", half, "--output", store,
              "--columns", "nope"])


def test_cli_profile_drift_against_baseline(spark, tmp_path, capsys):
    """--drift-against compares two profile stores sketch-to-sketch: same
    corpus reads stable (new_value_rate ~0), a churned column reads hot."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(SF)
    same = str(tmp_path / "same")
    docs.write.parquet(same)
    churn = str(tmp_path / "churn")
    docs.withColumn("source", F.concat(F.lit("NEW:"), "source")) \
        .write.parquet(churn)

    base_store = str(tmp_path / "bp")
    _run(capsys, ["profile", "--input", SF, "--output", base_store,
                  "--columns", "lang,source"])
    s_same = _run(capsys, ["profile", "--input", same,
                           "--output", str(tmp_path / "sp"),
                           "--columns", "lang,source",
                           "--drift-against", base_store])
    assert s_same["drift"]["lang"]["new_value_rate"] <= 0.05
    assert s_same["drift"]["source"]["est_jaccard"] >= 0.95
    s_churn = _run(capsys, ["profile", "--input", churn,
                            "--output", str(tmp_path / "cp"),
                            "--columns", "lang,source",
                            "--drift-against", base_store])
    assert s_churn["drift"]["source"]["new_value_rate"] >= 0.95
    assert s_churn["drift"]["lang"]["new_value_rate"] <= 0.05


def test_cli_sample_exact_k(spark, tmp_path, capsys):
    out = str(tmp_path / "ek")
    s = _run(capsys, ["sample", "--input", SF, "--output", out, "--k", "5"])
    kept = spark.read.parquet(out)
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert s["kept"] == 100 and all(n == 5 for n in per.values())
    out2 = str(tmp_path / "ekg")
    s2 = _run(capsys, ["sample", "--input", SF, "--output", out2,
                       "--k", "30", "--no-strata"])
    assert s2["kept"] == 30
    from owl2jsonschema_js_spark.curate import main
    with pytest.raises(SystemExit):   # --k and --rate conflict
        main(["sample", "--input", SF, "--output", str(tmp_path / "x"),
              "--k", "5", "--rate", "0.5"])


def test_cli_dedup_keep_longest(spark, tmp_path, capsys):
    out = str(tmp_path / "dl")
    s = _run(capsys, ["dedup", "--input", SF, "--output", out,
                      "--keep-longest"])
    assert s["policy"] == "longest" and s["dropped"] > 0
    kept = spark.read.parquet(out)
    assert kept.count() == s["survivors"]
