"""Stored-bucket LSH index (operators/lsh_store.py).

Contracts: (1) increment pairs == the in-memory incremental kernel's pairs
on the same split (which test_dedup_incremental.py already proves == batch
restricted to new); (2) a replayed increment appends nothing and re-emits
nothing; (3) two successive increments end with the store == a full
recompute and the pair union == the batch pair set minus seed-internal
pairs; (4) plan gate — an increment never reads the stored `sig` column."""

import pytest
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.operators.dedup import (
    minhash_features, minhash_lsh_pairs, minhash_lsh_pairs_incremental)
from owl2jsonschema_js_spark.operators.lsh_store import LshIndexStore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairset(df):
    return {(r["a_id"], r["b_id"]): round(r["jaccard"], 6) for r in df.collect()}


def test_store_increment_equals_inmemory_kernel(spark, docs, tmp_path):
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    got = _pairset(store.increment(new))

    index = minhash_features(old).persist()
    exp = _pairset(minhash_lsh_pairs_incremental(new, index, threshold=0.7)[0])
    index.unpersist()
    assert got == exp and got, "stored-bucket lane must match the kernel"


def test_store_replayed_increment_is_noop(spark, docs, tmp_path):
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    first = _pairset(store.increment(new))
    n_feat = store.features().count()
    n_bucket = store.buckets().count()

    replay = store.increment(new)  # crash-replay / re-crawled ids
    assert replay.count() == 0
    assert store.features().count() == n_feat
    assert store.buckets().count() == n_bucket
    assert store.features().groupBy("id").count().where("count > 1").count() == 0
    assert first, "fixture must have produced pairs for this test to bite"


def test_store_two_increments_match_full_recompute(spark, docs, tmp_path):
    third = [docs.where(F.col("doc_id") % 3 == k) for k in range(3)]
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(third[0])
    p1 = _pairset(store.increment(third[1]))
    p2 = _pairset(store.increment(third[2]))

    # store contents == one-shot recompute over everything
    got_feat = {r["id"]: (list(r["sig"]), len(r["grams"]))
                for r in store.features().collect()}
    exp_feat = {r["id"]: (list(r["sig"]), len(r["grams"]))
                for r in minhash_features(docs).collect()}
    assert got_feat == exp_feat

    # pair union == batch pairs minus those internal to the seed corpus
    batch = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    exp = {p: j for p, j in batch.items()
           if not (p[0] % 3 == 0 and p[1] % 3 == 0)}
    union = dict(p1)
    union.update(p2)
    assert union == exp
    assert not (set(p1) & set(p2)), "an increment re-emitted earlier pairs"


def test_stored_monitor_accumulates_index(spark, docs, tmp_path):
    """Two micro-batches through dedup_monitor_stored == the full batch pair
    set — the stored-bucket backend carries corpus memory across batches
    exactly like the plain monitor, minus the per-batch corpus re-band."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor_stored

    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    pairs_path = str(tmp_path / "pairs")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    attach = dedup_monitor_stored(str(tmp_path / "store"), pairs_path,
                                  str(tmp_path / "ckpt"), threshold=0.7)
    q = attach(stream).start()
    q.awaitTermination(300)

    got = _pairset(spark.read.parquet(pairs_path))
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert got == full


def test_stored_monitor_replay_is_exactly_once_never_lossy(spark, docs, tmp_path):
    """Crash-replay semantics of the two-phase prepare/grow ordering: a
    replay after BOTH appends is a no-op (the recomputed pair set is empty,
    and a dynamic partition overwrite of zero partitions touches nothing);
    and because pairs commit before the store grows, no crash point can
    lose a batch's pairs."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor_stored

    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    pairs_path = str(tmp_path / "pairs")
    attach = dedup_monitor_stored(str(tmp_path / "store"), pairs_path,
                                  str(tmp_path / "ckpt"), threshold=0.7)
    attach.write_batch(half, 0)
    n_pairs = spark.read.parquet(pairs_path).count()
    attach.write_batch(half, 0)  # replay after both appends: nothing happens
    assert spark.read.parquet(pairs_path).count() == n_pairs

    attach.write_batch(rest, 1)
    got = _pairset(spark.read.parquet(pairs_path))
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert got == full


def test_stored_monitor_replay_between_pairs_and_grow_no_duplicate_pairs(
        spark, docs, tmp_path):
    """THE crash window: the pairs partition committed, the grow lost. The
    replayed batch regenerates the identical pair set (the store hasn't
    grown) and must OVERWRITE its batch_id partition, not append a second
    copy — previously this window duplicated that batch's pair rows."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor_stored

    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    pairs_path = str(tmp_path / "pairs")
    store_root = str(tmp_path / "store")
    attach = dedup_monitor_stored(store_root, pairs_path,
                                  str(tmp_path / "ckpt"), threshold=0.7)
    attach.write_batch(half, 0)

    # first attempt of batch 1 crashes AFTER the pairs commit, BEFORE grow:
    # reproduce exactly the monitor's pairs write, then drop the grow
    store = LshIndexStore(spark, store_root, threshold=0.7)
    pairs1, _fresh = store.prepare(rest)
    (pairs1.withColumn("batch_id", F.lit(1))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(pairs_path))
    n_batch1 = (spark.read.parquet(pairs_path)
                .where(F.col("batch_id") == 1).count())
    assert n_batch1 > 0, "fixture must exercise a nonempty crash window"

    attach.write_batch(rest, 1)  # the streaming engine's replay
    all_pairs = spark.read.parquet(pairs_path)
    assert all_pairs.groupBy("a_id", "b_id").count() \
        .where("count > 1").count() == 0, "replay duplicated pair rows"
    assert all_pairs.where(F.col("batch_id") == 1).count() == n_batch1
    got = _pairset(all_pairs)
    full = _pairset(minhash_lsh_pairs(docs, threshold=0.7))
    assert got == full
    # and the grow completed on replay: a further replay is a no-op
    attach.write_batch(rest, 1)
    assert spark.read.parquet(pairs_path).count() == all_pairs.count()


def test_partial_grow_crash_is_healed_by_replay(spark, docs, tmp_path):
    """Crash INSIDE grow() — features appended, buckets not (the write
    order guarantees this is the only partial state). The replayed
    increment must re-detect everything (an id counts as indexed only when
    in BOTH tables), re-emit its pairs, and complete the buckets append —
    leaving the store byte-equivalent to an uncrashed run. Keying replay
    idempotency on features alone would lose the band rows forever."""
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)

    pairs1, fresh = store.prepare(new)
    # simulate the crash: only the features append lands
    fresh.write.mode("append").parquet(store.features_path)
    n_bucket_before = store.buckets().count()

    replay = store.increment(new)          # the monitor's replayed batch
    assert _pairset(replay) == _pairset(pairs1), \
        "replay after partial grow must re-emit the full pair set"
    assert store.buckets().count() > n_bucket_before
    # store now equals an uncrashed end state: no dup rows either table
    assert store.features().groupBy("id").count().where("count > 1").count() == 0
    assert (store.buckets().groupBy("id", "band_no").count()
            .where("count > 1").count() == 0)
    # and a further replay is a clean no-op
    assert store.increment(new).count() == 0


def test_doctor_rebands_create_orphans(spark, docs, tmp_path):
    """create()'s crash window (features written, buckets never) is healed
    by doctor(), which re-bands the orphans from their stored signatures."""
    import shutil

    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    reference = LshIndexStore(spark, str(tmp_path / "ref"), threshold=0.7)
    reference.create(old)

    shutil.rmtree(store.buckets_path)      # simulate the create() crash
    healed = store.doctor()
    n_feat = store.features().count()
    assert n_feat > 0 and healed == n_feat
    assert store.doctor() == 0             # consistent now
    # healed store behaves identically to an uncrashed one
    got = _pairset(store.increment(new))
    exp = _pairset(reference.increment(new))
    assert got == exp and got


def test_store_increment_never_reads_stored_sig(spark, docs, tmp_path):
    """The whole point of storing the band keys: the increment's plan must
    touch the stored features only at (id, grams) — re-banding would show as
    `sig` in a ReadSchema over the features path."""
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)

    # the exact lazy plan increment() executes, without the grow
    fresh = (minhash_features(new, store.n_hashes, store.shingle_k)
             .join(store.features().select("id"), "id", "left_anti"))
    pairs = store._increment_plan(fresh)

    # structural gate, independent of path truncation in Location strings:
    # the ONLY parquet source carrying a `sig` column is the stored features
    # table (the increment's sig comes from the pandas UDF over documents),
    # so no FileScan may project sig — while grams MUST appear (the verify
    # join's stored-grams scan), proving the gate actually sees the store.
    import re
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet \[[^\]]*\]", plan)
    assert scans, "plan gate should see FileScan nodes"
    offending = [s for s in scans if re.search(r"\bsig#", s)]
    assert not offending, f"stored sig column was scanned:\n{offending}"
    assert any(re.search(r"\bgrams#", s) for s in scans), \
        "plan gate should see the stored grams scan"


def test_partial_band_set_crash_is_healed(spark, docs, tmp_path):
    """Crash inside the BUCKETS append's job commit: task files move
    sequentially, so an id can land with a partial band set (here: bands
    0-3 of 8). Healing keyed on id presence would declare those ids done
    and silently lose the missing bands' candidate recall forever; healing
    must key on (id, band_no)."""
    from owl2jsonschema_js_spark.operators.dedup import _banded

    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    reference = LshIndexStore(spark, str(tmp_path / "ref"), threshold=0.7)
    reference.create(old)
    exp = _pairset(reference.increment(new))

    pairs1, fresh = store.prepare(new)
    fresh = fresh.localCheckpoint(eager=True)  # survive the partial writes
    # simulate the crash: features land, and only HALF of each id's bands
    fresh.write.mode("append").parquet(store.features_path)
    (_banded(fresh, store.n_hashes, store.bands)
     .where(F.col("band_no") < store.bands // 2)
     .write.mode("append").partitionBy("band_no").parquet(store.buckets_path))

    replay = store.increment(new)
    assert _pairset(replay) == _pairset(pairs1) == exp, \
        "replay after a partial band-set crash must re-emit the full pair set"
    # every indexed id now has its complete distinct band set, no dup rows
    bad = (store.buckets().groupBy("id")
           .agg(F.count_distinct("band_no").alias("nb"),
                F.count(F.lit(1)).alias("n"))
           .where((F.col("nb") != store.bands) | (F.col("n") != store.bands)))
    assert bad.count() == 0
    assert store.increment(new).count() == 0  # further replay: clean no-op


def test_doctor_completes_partial_band_sets(spark, docs, tmp_path):
    """doctor() must heal ids whose band set is merely INCOMPLETE (the
    buckets-append crash residue), not only ids with zero band rows."""
    from owl2jsonschema_js_spark.operators.dedup import _banded

    old = docs.where(F.col("doc_id") % 2 == 0)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    import shutil
    shutil.rmtree(store.buckets_path)
    # rebuild buckets with half of each id's bands missing
    (_banded(store.features(), store.n_hashes, store.bands)
     .where(F.col("band_no") < store.bands // 2)
     .write.mode("error").partitionBy("band_no").parquet(store.buckets_path))

    n_ids = store.features().count()
    assert store.doctor() == n_ids
    assert store.doctor() == 0
    bad = (store.buckets().groupBy("id")
           .agg(F.count_distinct("band_no").alias("nb"),
                F.count(F.lit(1)).alias("n"))
           .where((F.col("nb") != store.bands) | (F.col("n") != store.bands)))
    assert bad.count() == 0


def test_features_only_store_fails_loudly(spark, docs, tmp_path):
    """A store left features-only by a crashed create() must raise in
    prepare()/increment() instead of silently emitting zero pairs against
    the entire stored corpus (every stored-side candidate is structurally
    absent when buckets/ is empty)."""
    import shutil

    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    store = LshIndexStore(spark, str(tmp_path / "lsh"), threshold=0.7)
    store.create(old)
    shutil.rmtree(store.buckets_path)      # the create() crash residue

    with pytest.raises(RuntimeError, match="doctor"):
        store.increment(new)
    assert store.doctor() > 0              # and doctor still repairs it
    assert store.increment(new).count() > 0


def test_store_first_increment_on_string_ids(spark, tmp_path):
    """Ids keep their source dtype end-to-end; the PRE-CREATE empty-table
    fallbacks must type their id column from the increment, not a hardcoded
    long — a string-id corpus used to crash batch 0 on a string-vs-bigint
    least()/union."""
    mk = lambda pref, n: spark.createDataFrame(
        [(f"{pref}-{i}", ("lorem ipsum dolor sit amet " * 10) + str(i % 3))
         for i in range(n)], "doc_id string, text string")
    store = LshIndexStore(spark, str(tmp_path / "lsh_str"), threshold=0.5)
    p1 = store.increment(mk("doc", 12))           # empty store: bootstrap path
    assert p1.count() > 0
    assert p1.schema["a_id"].dataType.simpleString() == "string"
    p2 = store.increment(mk("new", 4))            # against stored string ids
    got = {(r["a_id"], r["b_id"]) for r in p2.collect()}
    assert got and all(a.startswith("new-") or b.startswith("new-")
                       for a, b in got)
    assert store.features().schema["id"].dataType.simpleString() == "string"


def test_streaming_monitor_batch0_on_string_ids(spark, tmp_path):
    """Same dtype contract for the plain streaming monitor's empty bootstrap
    index (batch 0 of a string-doc-id stream)."""
    from owl2jsonschema_js_spark.streaming.dedup_stream import dedup_monitor

    attach = dedup_monitor(str(tmp_path / "idx"), str(tmp_path / "pairs"),
                           str(tmp_path / "ckpt"), threshold=0.5)
    batch = spark.createDataFrame(
        [(f"conv-{i}", ("alpha beta gamma delta " * 12) + str(i % 2))
         for i in range(10)], "doc_id string, text string")
    attach.write_batch(batch, 0)                  # used to raise on batch 0
    pairs = spark.read.parquet(str(tmp_path / "pairs"))
    assert pairs.count() > 0
    assert pairs.schema["a_id"].dataType.simpleString() == "string"
    idx = spark.read.parquet(str(tmp_path / "idx"))
    assert idx.schema["id"].dataType.simpleString() == "string"
