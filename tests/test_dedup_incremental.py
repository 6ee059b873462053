"""Incremental MinHash-LSH dedup: new documents vs a stored corpus index.

Contracts: (1) signatures are identical whether computed batch or
incrementally (fixed module seeds); (2) incremental pairs == the batch pair
set restricted to pairs involving >=1 new doc; (3) old-old pairs are
structurally excluded; (4) the returned index equals a full recompute."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.operators.dedup import (
    minhash_features, minhash_lsh_pairs, minhash_lsh_pairs_incremental)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairset(df):
    return {(r["a_id"], r["b_id"]): round(r["jaccard"], 6) for r in df.collect()}


def test_incremental_equals_batch_restricted_to_new(spark, docs):
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    batch = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert batch, "corpus should contain near-dup pairs"

    index = minhash_features(old).persist()
    inc_pairs, new_index = minhash_lsh_pairs_incremental(new, index, threshold=0.7)
    got = _pairset(inc_pairs)

    expected = {p: j for p, j in batch.items()
                if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == expected
    # old-old pairs exist in the batch set and are structurally excluded here
    old_old = {p for p in batch if p[0] % 2 == 0 and p[1] % 2 == 0}
    assert old_old, "fixture should contain old-old pairs for this test to bite"
    assert not (set(got) & old_old)
    index.unpersist()


def test_incremental_index_equals_full_recompute(spark, docs):
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    _, new_index = minhash_lsh_pairs_incremental(new, minhash_features(old))
    full = minhash_features(docs)

    got = {r["id"]: (list(r["sig"]), len(r["grams"]))
           for r in new_index.collect()}
    exp = {r["id"]: (list(r["sig"]), len(r["grams"]))
           for r in full.collect()}
    assert got == exp


def test_signature_determinism_batch_vs_incremental_lane(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["id"]: list(r["sig"]) for r in minhash_features(df).collect()}
    b = {r["id"]: list(r["sig"]) for r in minhash_features(df).collect()}
    assert a == b and set(a) == {1, 2}
    assert a[1] != a[2]


def test_streaming_dedup_monitor_accumulates_index(spark, tmp_path):
    """Two micro-batches through dedup_monitor: batch 0 seeds the index
    (internal pairs only), batch 1 dedups against it. The union of emitted
    pairs must equal the full batch pair set over all documents — proving
    the table-backed index carries corpus memory across batches."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    # one file per half -> maxFilesPerTrigger=1 gives two micro-batches
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    attach = dedup_monitor(index_path, pairs_path,
                           str(tmp_path / "ckpt"), threshold=0.7)
    q = attach(stream).start()
    q.awaitTermination(300)

    got = _pairset(spark.read.parquet(pairs_path))
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert got == full
    n_batches = (spark.read.parquet(pairs_path)
                 .select("batch_id").distinct().count())
    # pairs may all land in one batch's output only if that batch found them;
    # the INDEX must still contain every doc's signature
    idx = spark.read.parquet(index_path)
    assert idx.count() == minhash_features(docs).count()
    assert n_batches >= 1


def test_incremental_replay_is_idempotent(spark, docs):
    """A re-delivered batch (foreachBatch crash-replay) or re-crawled id must
    neither duplicate index rows nor re-emit pairs: already-indexed ids are
    anti-joined out before anything else."""
    idx = minhash_features(docs)  # everything already indexed
    pairs, new_index = minhash_lsh_pairs_incremental(
        docs.limit(50), idx, threshold=0.7)
    assert pairs.count() == 0
    assert new_index.count() == idx.count()


def test_incremental_default_path_leaves_no_session_cache(spark, docs):
    """Round-4 leak fix (ADVICE r3): calling the kernel WITHOUT new_feat must
    not leave a persisted frame behind — the internal increment
    materialization is an eager localCheckpoint (ContextCleaner-released on
    GC), never a session-lifetime DataFrame persist."""
    spark.catalog.clearCache()
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    pairs, new_index = minhash_lsh_pairs_incremental(
        new, minhash_features(old), threshold=0.7)
    assert pairs.count() > 0
    assert new_index.count() > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), \
        "kernel registered a DataFrame persist with no release handle"


def test_monitor_replayed_batch_does_not_duplicate_index(spark, tmp_path, docs):
    """Round-4 fix (ADVICE r3 medium): a foreachBatch replay after both
    appends must not stack duplicate (id, grams, sig) rows into the stored
    index — duplicated gram rows would fan out the verify join and multiply
    emitted pairs for those ids in every later batch."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor

    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    attach = dedup_monitor(index_path, pairs_path,
                           str(tmp_path / "ckpt"), threshold=0.7)
    attach.write_batch(half, 0)
    n_idx = spark.read.parquet(index_path).count()
    attach.write_batch(half, 0)  # crash-replay of the same batch
    idx = spark.read.parquet(index_path)
    assert idx.count() == n_idx, "replayed batch duplicated index rows"
    assert idx.groupBy("id").count().where("count > 1").count() == 0

    # later batch still emits the correct cross-batch pairs, exactly once
    attach.write_batch(rest, 1)
    got = _pairset(spark.read.parquet(pairs_path)
                   .where(F.col("batch_id") == 1))
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    expected = {p: j for p, j in full.items()
                if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == expected


def test_monitor_replay_between_pairs_and_index_no_duplicate_pairs(
        spark, tmp_path, docs):
    """THE remaining crash window of the plain monitor (round-5 fix): pairs
    partition committed, index append lost. The replay regenerates the
    identical pair set against the un-grown index and must overwrite its
    batch_id partition rather than append a duplicate copy."""
    import shutil

    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor

    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    attach = dedup_monitor(index_path, pairs_path,
                           str(tmp_path / "ckpt"), threshold=0.7)
    attach.write_batch(half, 0)

    # run batch 1 fully, then roll the INDEX back to its pre-batch state:
    # the on-disk result is exactly "crashed after the pairs write, before
    # the index append"
    snap = str(tmp_path / "index_snap")
    shutil.copytree(index_path, snap)
    attach.write_batch(rest, 1)
    n_batch1 = (spark.read.parquet(pairs_path)
                .where(F.col("batch_id") == 1).count())
    assert n_batch1 > 0, "fixture must exercise a nonempty crash window"
    shutil.rmtree(index_path)
    shutil.copytree(snap, index_path)

    attach.write_batch(rest, 1)  # the streaming engine's replay
    all_pairs = spark.read.parquet(pairs_path)
    assert all_pairs.groupBy("a_id", "b_id").count() \
        .where("count > 1").count() == 0, "replay duplicated pair rows"
    assert all_pairs.where(F.col("batch_id") == 1).count() == n_batch1
    got = _pairset(all_pairs)
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert got == full
    # index healed on replay: every doc indexed exactly once
    idx = spark.read.parquet(index_path)
    assert idx.groupBy("id").count().where("count > 1").count() == 0
    assert idx.count() == minhash_features(docs).count()


def test_dup_clusters_empty_pairs_converges_immediately(spark):
    """Regression (round-3 self-review): sum() over an empty label table is
    NULL — the convergence check must treat that as a fixpoint, not loop to
    max_iter over empty frames."""
    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([], "a_id long, b_id long")
    stats = {}
    # forced distributed: this regression-tests the LOOP's NULL-sum fixpoint
    res = dup_clusters(pairs, max_iter=20, stats=stats, small_graph_max=0)
    assert res.count() == 0
    res.unpersist()
    assert stats["rounds"] <= 2, stats
    # the driver fast path must also hand back a correctly-typed empty frame
    res2 = dup_clusters(pairs, max_iter=20, stats=stats)
    assert res2.count() == 0 and stats["mode"] == "driver"
    assert [f.name for f in res2.schema.fields] == ["id", "cluster_id"]
    res2.unpersist()


def test_survivor_priority_policy(spark):
    """priority_col keeps the LARGEST-priority member per cluster (ties by
    largest id; NULL priority loses to any non-NULL); default stays min-id."""
    from owl2jsonschema_js_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the much longer copy"), (3, "mid text"),
         (10, "tie"), (11, "tie"),
         (20, None), (21, "only non-null"),
         (99, "unpaired")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "a_id long, b_id long")

    default = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert default == {1, 10, 20, 99}          # min-id reps + unpaired

    import pyspark.sql.functions as F
    longest = {r["doc_id"] for r in dedup_survivors(
        docs, pairs, priority_col=F.octet_length("text")).collect()}
    assert longest == {2, 11, 21, 99}          # longest; tie -> max id;
                                               # NULL loses
    again = {r["doc_id"] for r in dedup_survivors(
        docs, pairs, priority_col=F.octet_length("text")).collect()}
    assert again == longest                    # deterministic
