"""Persisted IVF index (operators/ivf_store.py): exactness at full probe,
incremental growth == full rebuild semantics, replay idempotency, and the
partition-pruning plan gate that realizes the IVF scan saving on disk."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.operators.ivf_store import IvfIndexStore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding").cache()


def _brute_topk(rows, queries, k):
    """(query_id, vec_id) rank list via numpy float64 dot, ties on vec_id."""
    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    out = {}
    for j, q in enumerate(queries):
        s = M @ np.asarray(q, dtype=np.float64)
        order = sorted(range(len(ids)), key=lambda i: (-s[i], ids[i]))[:k]
        out[j] = [int(ids[i]) for i in order]
    return out


def test_create_query_full_probe_equals_brute_force(spark, emb, tmp_path):
    store = IvfIndexStore(spark, str(tmp_path / "ivf"), n_centroids=8)
    store.create(emb)
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    queries = [r["embedding"] for r in
               emb.where("vec_id < 4").orderBy("vec_id").collect()]

    got = store.query(queries, k=5, nprobe=8)  # nprobe = n_centroids: exact
    by_q = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == _brute_topk(rows, queries, 5)


def test_increment_then_query_covers_full_corpus(spark, emb, tmp_path):
    """create(old) + increment(new) answers over the WHOLE corpus exactly
    (full probe), with the quantizer frozen at create time; a replayed
    increment appends nothing and changes nothing."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf2"), n_centroids=8)
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    store.create(old)
    n_added = store.increment(new)
    assert n_added == new.count()

    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    queries = [r["embedding"] for r in
               emb.where("vec_id < 3").orderBy("vec_id").collect()]
    got = store.query(queries, k=4, nprobe=8)
    by_q = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == _brute_topk(rows, queries, 4)

    # replay / re-crawl idempotency: same increment again is a no-op
    assert store.increment(new) == 0
    assert store._postings().count() == emb.count()
    assert store._postings().groupBy("vec_id").count() \
        .where("count > 1").count() == 0
    got2 = store.query(queries, k=4, nprobe=8)
    assert sorted(map(tuple, got2.select("query_id", "vec_id", "rank")
                      .collect())) == \
        sorted(map(tuple, got.select("query_id", "vec_id", "rank").collect()))


def test_query_scan_is_partition_pruned(spark, emb, tmp_path):
    """The on-disk IVF saving: probing nprobe of n_centroids lists must reach
    the parquet scan as a PARTITION filter on list_id — unprobed lists are
    never read."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf3"), n_centroids=8)
    store.create(emb)
    pruned = store._postings().where(F.col("list_id").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters")[1][:300]
    assert "list_id" in part_section, part_section
    # and a low-probe query returns only rows from probed lists
    q = [emb.where("vec_id = 0").first()["embedding"]]
    got = store.query(q, k=3, nprobe=1)
    assert 0 < got.count() <= 3


def test_crashed_rebuild_keeps_serving_previous_epoch(spark, emb, tmp_path):
    """Epoch commit discipline: a rebuild that crashes before its commit-log
    append leaves a half-written epoch directory that is NEVER referenced —
    queries keep serving the previous epoch's consistent quantizer+postings
    (the failure that a flat layout turns into a silent recall hole)."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf5"), n_centroids=8)
    store.create(emb)
    before = store.centroids()
    queries = [emb.where("vec_id = 0").first()["embedding"]]
    want = sorted(map(tuple, store.query(queries, k=4, nprobe=8)
                      .select("vec_id", "rank").collect()))

    # simulate a crashed create: both tables of epoch 2 written, commit lost
    cents = store.centroids()
    (spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents[::-1])],
        "list_id int, centroid array<double>")
     .write.mode("overwrite").parquet(f"{store.root}/epoch=2/centroids"))
    (store._assigned(emb.limit(10), cents)
     .write.mode("overwrite").partitionBy("list_id")
     .parquet(f"{store.root}/epoch=2/postings"))

    assert store._epoch() == 1
    assert np.allclose(store.centroids(), before)
    got = sorted(map(tuple, store.query(queries, k=4, nprobe=8)
                     .select("vec_id", "rank").collect()))
    assert got == want
    # a completed rebuild OVERWRITES the crashed epoch-2 leftovers (mode
    # overwrite heals the half-written directory), commits it, and serves
    # the full corpus again
    store.create(emb)
    assert store._epoch() == 2
    assert store._postings().count() == emb.count()


def test_uncommitted_store_raises_loudly(spark, tmp_path):
    store = IvfIndexStore(spark, str(tmp_path / "ivf6"))
    with pytest.raises(ValueError, match="no committed epoch"):
        store.query([[0.0] * 64], k=1)


def test_stats_profile_sums_to_corpus(spark, emb, tmp_path):
    store = IvfIndexStore(spark, str(tmp_path / "ivf4"), n_centroids=8)
    store.create(emb)
    s = store.stats()
    assert s["n_vectors"] == emb.count()
    assert s["n_lists"] <= 8 and s["max_list"] >= 1
    assert 0.0 < s["max_list_frac"] <= 1.0


def test_query_and_increment_pin_epoch_once(spark, emb, tmp_path):
    """Torn-read guard: a multi-read operation must resolve the epoch ONCE
    and read quantizer + postings from it — per-read resolution would let a
    concurrent create() commit in between and pair one epoch's quantizer
    with another's assignments (the silent recall hole the epoch commit
    exists to prevent)."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf6"), n_centroids=8)
    store.create(emb.where("vec_id % 2 = 0"))

    calls = []
    orig = store._epoch

    def counting():
        calls.append(1)
        return orig()

    store._epoch = counting
    q = [emb.where("vec_id = 0").first()["embedding"]]
    store.query(q, k=2, nprobe=8).collect()
    assert len(calls) == 1, "query() must resolve the epoch exactly once"

    calls.clear()
    store.increment(emb.where("vec_id % 2 = 1"))
    assert len(calls) == 1, "increment() must resolve the epoch exactly once"


def test_query_empty_batch_returns_empty_frame(spark, emb, tmp_path):
    """An empty query batch (upstream filter matched nothing) returns an
    empty, correctly-typed frame instead of crashing in np.stack."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf7"), n_centroids=8)
    store.create(emb)
    got = store.query([], k=3, nprobe=2)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == \
        ["query_id", "vec_id", "score", "rank"]


def test_query_with_caller_ids_labels_results(spark, emb, tmp_path):
    """ids= labels results with the CALLER's query ids straight from the
    scoring pass — the mechanism-level fix for the positional-id footgun
    (positions 0..M-1 silently collide with real corpus ids). Same ranked
    lists as the positional call, relabeled; int and string ids both type
    the query_id column via Spark's own inference."""
    store = IvfIndexStore(spark, str(tmp_path / "ivf8"), n_centroids=8)
    store.create(emb)
    queries = [r["embedding"] for r in
               emb.where("vec_id in (0, 3)").orderBy("vec_id").collect()]

    pos = store.query(queries, k=4, nprobe=8)
    by_pos = {}
    for r in pos.orderBy("query_id", "rank").collect():
        by_pos.setdefault(r["query_id"], []).append(r["vec_id"])

    got_int = store.query(queries, k=4, nprobe=8, ids=[10, 21])
    assert got_int.schema["query_id"].dataType.simpleString() == "bigint"
    by_int = {}
    for r in got_int.orderBy("query_id", "rank").collect():
        by_int.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_int == {10: by_pos[0], 21: by_pos[1]}

    got_str = store.query(queries, k=4, nprobe=8, ids=["qa", "qb"])
    assert got_str.schema["query_id"].dataType.simpleString() == "string"
    by_str = {}
    for r in got_str.orderBy("query_id", "rank").collect():
        by_str.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_str == {"qa": by_pos[0], "qb": by_pos[1]}

    with pytest.raises(ValueError, match="length mismatch"):
        store.query(queries, k=2, ids=[10])
    empty = store.query([], k=2, ids=[])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == \
        ["query_id", "vec_id", "score", "rank"]
