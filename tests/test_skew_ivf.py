"""Skew primitives + IVF ANN tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_salted_group_agg_equals_plain(spark, fixture60):
    from owl2jsonschema_js_spark.skew import salted_group_agg

    df = fixture60.to_spark(spark)
    plain = {r["conv_id"]: (r["n"], r["mx"]) for r in
             df.groupBy("conv_id").agg(F.count("*").alias("n"),
                                       F.max("turn_idx").alias("mx")).collect()}
    salted = salted_group_agg(
        df, "conv_id",
        partial_aggs=[F.count("*").alias("pn"), F.max("turn_idx").alias("pmx")],
        merge_aggs=[F.sum("pn").alias("n"), F.max("pmx").alias("mx")],
        salt_from="turn_idx",
    )
    got = {r["conv_id"]: (r["n"], r["mx"]) for r in salted.collect()}
    assert got == plain


def test_role_alternation_exact(spark):
    from owl2jsonschema_js_spark.skew import role_alternation_violations

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c2", 0, "user"), ("c2", 1, "user"),           # violation at c2/1
        ("c2", 2, "assistant"), ("c2", 3, "assistant"),  # violation at c2/3
        ("c3", 0, "system"), ("c3", 1, "system"),        # system repeats allowed
        ("c4", 0, "user"),                               # conv boundary: c4/0 ok
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {(r["conv_id"], r["turn_idx"]) for r in
           role_alternation_violations(df).collect()}
    assert got == {("c2", 1), ("c2", 3)}


def test_role_alternation_batch_boundary(spark):
    """Force tiny Arrow batches so a conversation spans batches — the carried
    last-row must keep boundary detection exact."""
    from owl2jsonschema_js_spark.skew import role_alternation_violations

    n = 501
    rows = [("c1", i, "user") for i in range(n)]  # every row after 0 violates
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        assert role_alternation_violations(df).count() == n - 1
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_ivf_topk_matches_bruteforce(spark):
    from owl2jsonschema_js_spark.operators.similarity import ivf_topk, topk_neighbors

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).first()["embedding"]]
    brute = [r["vec_id"] for r in
             topk_neighbors(emb, qvec, k=5, metric="dot", exclude_id=0).collect()]
    ivf = [r["vec_id"] for r in
           ivf_topk(emb, qvec, k=5, n_centroids=8, nprobe=4, exclude_id=0).collect()]
    # IVF probes half the lists: require >= 3/5 overlap with exact top-5
    assert len(set(brute) & set(ivf)) >= 3
    # and full recall when probing every list
    ivf_all = [r["vec_id"] for r in
               ivf_topk(emb, qvec, k=5, n_centroids=8, nprobe=8, exclude_id=0).collect()]
    assert ivf_all == brute


def test_aqe_skew_join_correct_under_hot_key(spark, tmp_path):
    """Join the skewed transcripts (one conv ~30% of rows) to a per-conv dim
    with AQE skew-join enabled — results must equal the per-conv expected
    row counts (AQE split of the hot partition must not duplicate or drop)."""
    from owl2jsonschema_js_spark.datagen import gen_transcripts_spark

    df = gen_transcripts_spark(spark, n_rows=200_000, n_convs=50)
    p = str(tmp_path / "t")
    df.write.parquet(p)
    df = spark.read.parquet(p)
    dim = df.groupBy("conv_id").count().withColumnRenamed("count", "n_dim")

    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # force the skew path to actually trigger on this small fixture
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = df.join(dim, "conv_id")
        per_conv = {r["conv_id"]: r["n"] for r in
                    joined.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        expected = {r["conv_id"]: r["n_dim"] for r in dim.collect()}
        assert per_conv == expected
        # the hot conversation really is hot (skew premise holds)
        assert max(expected.values()) > 0.25 * sum(expected.values())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_ivf_kmeans_recall_on_clustered_data(spark):
    """Trained IVF (2 Lloyd iterations) on clustered vectors: recall@5 vs
    brute force must be high while probing only 4 of 16 lists."""
    from owl2jsonschema_js_spark.operators.similarity import ivf_topk, topk_neighbors

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((16, 16)) * 4
    rows = []
    for i in range(800):
        c = i % 16
        v = centers[c] + rng.standard_normal(16) * 0.3
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]

    exact = [r["vec_id"] for r in
             topk_neighbors(emb, q, k=5, metric="cosine", exclude_id=0).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, q, k=5, n_centroids=16, nprobe=4,
                       exclude_id=0, train_iters=2).collect()]
    recall = len(set(exact) & set(approx)) / 5
    assert recall >= 0.8, (recall, exact, approx)


def test_ivf_topk_batch_allprobe_equals_per_query_brute(spark):
    """With nprobe == n_centroids the batched path is exact: every query's
    top-5 must equal its brute-force top-5, computed in ONE table scan."""
    from owl2jsonschema_js_spark.operators.similarity import (ivf_topk_batch,
                                                              topk_neighbors)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    qrows = emb.where(F.col("vec_id").isin(0, 1, 2)).orderBy("vec_id").collect()
    qvecs = [[float(x) for x in r["embedding"]] for r in qrows]
    out = ivf_topk_batch(emb, qvecs, k=5, n_centroids=8, nprobe=8)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for j, qv in enumerate(qvecs):
        brute = [r["vec_id"] for r in
                 topk_neighbors(emb, qv, k=5, metric="dot").collect()]
        mine = [v for _, v in sorted(got[j])]
        assert mine == brute, (j, mine, brute)


def test_ivf_topk_batch_pruned_probes_bound_candidates(spark):
    """With nprobe < n_centroids the candidate set must shrink accordingly
    (the scan-cost property), while still returning k rows per query."""
    from owl2jsonschema_js_spark.operators.similarity import ivf_topk_batch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    qvecs = [[float(x) for x in r["embedding"]] for r in
             emb.where(F.col("vec_id").isin(0, 5)).orderBy("vec_id").collect()]
    out = ivf_topk_batch(emb, qvecs, k=3, n_centroids=16, nprobe=4)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(1 <= r["rank"] <= 3 for r in rows)
    assert len(rows) == 6


def test_key_skew_profile_measures_planted_hot_conversation(spark, fixture60):
    """The fixtures plant one conversation holding ~30% of rows; the profile
    must surface it as max_share, rank it first, and account for every row —
    and the salt recommendation must spread it to ~1/32-per-reducer slices
    while a clean (unskewed) profile recommends no salting at all."""
    from owl2jsonschema_js_spark.skew import key_skew_profile, recommend_salts

    df = fixture60.to_spark(spark)
    prof = key_skew_profile(df, "conv_id", top_n=5)
    assert prof["n_rows"] == df.count()
    assert prof["n_keys"] == df.select("conv_id").distinct().count()
    assert prof["max_share"] > 0.2, prof["max_share"]
    top_key, top_n, top_share = prof["top"][0]
    exact = df.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    assert (top_key, top_n) == (exact["conv_id"], exact["count"])
    assert abs(top_share - top_n / prof["n_rows"]) < 1e-12

    s = recommend_salts(prof, target_share=1 / 32)
    assert s >= prof["max_share"] * 32 / 2 and s & (s - 1) == 0  # pow2, enough
    assert prof["max_share"] / s <= 1 / 32

    clean = {"max_share": 0.01, "n_rows": 1000, "n_keys": 100, "top": []}
    assert recommend_salts(clean, target_share=1 / 32) == 1


def test_salted_auto_width_from_measured_profile(spark, fixture60):
    """Round-4 (SURVEY §4.2 observe->decide): n_salts='auto' resolves the salt
    width from the MEASURED key histogram — >1 on the planted-hot fixture,
    exactly 1 on clean data — and the merged outputs are byte-identical to the
    plain aggregate at every width."""
    from owl2jsonschema_js_spark.skew import key_skew_profile, salted_group_agg

    df = fixture60.to_spark(spark)
    plain = {r["conv_id"]: (r["n"], r["mx"]) for r in
             df.groupBy("conv_id").agg(F.count("*").alias("n"),
                                       F.max("turn_idx").alias("mx")).collect()}

    def run_auto(frame, profile=None):
        out = salted_group_agg(
            frame, "conv_id",
            partial_aggs=[F.count("*").alias("pn"), F.max("turn_idx").alias("pmx")],
            merge_aggs=[F.sum("pn").alias("n"), F.max("pmx").alias("mx")],
            n_salts="auto", salt_from="turn_idx", profile=profile)
        return out, {r["conv_id"]: (r["n"], r["mx"]) for r in out.collect()}

    # hot fixture, self-measured: width spreads the hot key, values unchanged
    out, got = run_auto(df)
    assert out.salt_width > 1 and out.salt_width & (out.salt_width - 1) == 0
    assert got == plain

    # a stored ingest-time profile is honored without re-measuring df
    prof = key_skew_profile(df, "conv_id")
    out2, got2 = run_auto(df, profile=prof)
    assert out2.salt_width == out.salt_width
    assert got2 == plain

    # uniform data resolves to width 1 — auto never pays unasked-for salting
    # (the fixture minus its hot conv still has ~4% keys, past the 1/32
    # target, so a genuinely uniform frame is synthesized here)
    clean = (spark.range(1000)
             .select((F.col("id") % 100).cast("string").alias("conv_id"),
                     (F.col("id") / 100).cast("int").alias("turn_idx")))
    out3, got3 = run_auto(clean)
    assert out3.salt_width == 1
    assert all(v == (10, 9) for v in got3.values()) and len(got3) == 100

    # bad width type is rejected loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="auto"):
        salted_group_agg(df, "conv_id", [F.count("*").alias("pn")],
                         [F.sum("pn").alias("n")], n_salts="sixteen")


def test_write_bucketed_guard_enforces_measured_skew(spark, fixture60, tmp_path):
    """Round-4 (SURVEY §4.2): write_bucketed measures the bucket key before
    accepting its one-task-per-conversation trade — warn by default on the
    planted-hot fixture, raise on request, stay silent on clean data and under
    the deliberate override."""
    import warnings

    import pytest as _pytest

    from owl2jsonschema_js_spark.skew import key_skew_profile
    from owl2jsonschema_js_spark.sources.tableio import write_bucketed

    df = fixture60.to_spark(spark)
    try:
        with _pytest.warns(UserWarning, match="concentrates hot key"):
            write_bucketed(df, "guard_warn", n_buckets=4,
                           path=str(tmp_path / "gw"))

        with _pytest.raises(ValueError, match="concentrates hot key"):
            write_bucketed(df, "guard_raise", n_buckets=4,
                           path=str(tmp_path / "gr"), on_hot="raise")

        # a stored profile is honored (no re-measure) and still trips the guard
        prof = key_skew_profile(df, "conv_id", top_n=1)
        with _pytest.raises(ValueError, match="concentrates hot key"):
            write_bucketed(df, "guard_prof", n_buckets=4,
                           path=str(tmp_path / "gp"), profile=prof,
                           on_hot="raise")

        clean = df.where(F.col("conv_id") != prof["top"][0][0])
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning fails the test
            write_bucketed(clean, "guard_clean", n_buckets=4,
                           path=str(tmp_path / "gc"))
            write_bucketed(df, "guard_override", n_buckets=4,
                           path=str(tmp_path / "go"), on_hot="ignore")

        with _pytest.raises(ValueError, match="on_hot"):
            write_bucketed(df, "guard_bad", n_buckets=4, on_hot="explode")

        # a stored profile stripped of its top list (the API invites stored
        # profiles) still fires the guard — keylessly, never IndexError
        bare = {"max_share": prof["max_share"], "n_rows": prof["n_rows"],
                "n_keys": prof["n_keys"], "top": []}
        with _pytest.raises(ValueError, match="no top list"):
            write_bucketed(df, "guard_bare", n_buckets=4,
                           path=str(tmp_path / "gb"), profile=bare,
                           on_hot="raise")
    finally:
        for t in ("guard_warn", "guard_raise", "guard_prof", "guard_clean", "guard_bare",
                  "guard_override", "guard_bad"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_batch_preserves_source_id_dtype(spark):
    """ivf_topk_batch's output schema types the id from the SOURCE column —
    a string-id embedding corpus used to break at Arrow transfer on the
    hardcoded bigint."""
    import numpy as np

    from owl2jsonschema_js_spark.operators.similarity import ivf_topk_batch

    rng = np.random.default_rng(7)
    # unit vectors: scores are raw dot products, so self (dot = 1) is the
    # strict argmax only when every vector is normalized
    vecs = rng.standard_normal((40, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(f"vec-{i}", [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = ivf_topk_batch(emb, [rows[3][1], rows[17][1]], k=3,
                         n_centroids=4, nprobe=4)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    got = {r["query_id"]: r["vec_id"] for r in out.where("rank = 1").collect()}
    assert got == {0: "vec-3", 1: "vec-17"}  # full probe: self is nearest
