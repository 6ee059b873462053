"""Streaming near-dup detection: a document stream deduped incrementally
against a persistent corpus index.

The batch incremental operator (`operators/dedup.py
minhash_lsh_pairs_incremental`) is the per-micro-batch kernel; this module
adds the foreachBatch plumbing and the index lifecycle:

 * the index lives as a parquet table (at cluster scale: an Iceberg table —
   same TableIO lane as everything else) holding (id, grams, sig) rows from
   `minhash_features`;
 * each micro-batch signs only its own documents, bucket-joins against the
   stored index with the new-side restriction (old-old pairs never
   regenerate), appends detected pairs to the output, and appends its own
   signatures to the index — so the next batch sees this batch's docs;
 * state is therefore EXTERNALIZED to storage, not held in Spark streaming
   state: near-dup state is O(corpus) and must survive restarts/redeploys,
   which is exactly what a table gives and `applyInPandasWithState` does not.

This is the honest streaming split (mirrors drift_monitor's note): the
signature pass and bucket join are stateless per batch; the corpus memory is
a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_monitor(index_path: str, pairs_path: str, checkpoint_dir: str,
                  threshold: float = 0.7, n_hashes: int = 48, bands: int = 8,
                  shingle_k: int = 5, max_bucket: int = 64,
                  id_col: str = "doc_id", text_col: str = "text"):
    """foreachBatch incremental-dedup sink.

    Per micro-batch: read the index table (absent on the first batch), run
    the incremental pair kernel, append (batch_id, a_id, b_id, jaccard) to
    ``pairs_path`` and the batch's signatures to ``index_path``.

    Returns an attach(stream_df) factory; call ``.start()`` on the result
    (the per-batch kernel is exposed as ``attach.write_batch`` for direct
    testing). Replay idempotency, BOTH sinks: the INDEX append is
    id-anti-joined against the stored index, so a batch replayed after a
    crash that followed both appends (or a re-delivered/re-crawled id)
    appends nothing — duplicated (id, grams, sig) rows would otherwise fan
    out the verify-join's grams side and multiply emitted pair rows for
    those ids in every later batch. The PAIRS sink is overwrite-by-batch-id:
    each batch owns the ``batch_id=<n>`` partition directory and a replay
    REWRITES it (recomputed pairs are identical while the index hasn't
    grown, and a replay after the grow recomputes an empty set against an
    empty fresh side, which overwrites nothing and leaves the original
    partition standing) — the parquet emulation of the Iceberg
    MERGE/overwrite-by-filter commit the same layout uses at cluster scale,
    making the pairs output exactly-once under foreachBatch crash-replay."""
    from owl2jsonschema_js_spark.operators.dedup import (
        minhash_features, minhash_lsh_pairs_incremental)

    from pyspark.errors import AnalysisException

    def _load_index(spark):
        """Read the index table, or None before the first append. Probed by
        READING, not driver-local os.path.exists — the index lives wherever
        Spark's filesystem does (s3a/hdfs/file), and a local-path check would
        silently disable cross-batch dedup on any remote FS."""
        try:
            return spark.read.parquet(index_path)
        except AnalysisException:
            return None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = _load_index(spark)
        if index is None:
            # the empty bootstrap index types its id from the BATCH — ids
            # keep their source dtype end-to-end (minhash_features aliases,
            # never casts), so a hardcoded long here would crash batch 0 of
            # a string-doc-id stream on the union/least inside the kernel
            idt = batch_df.schema[id_col].dataType.simpleString()
            index = spark.createDataFrame(
                [], f"id {idt}, grams array<bigint>, sig array<bigint>")
        # sign the batch ONCE and anti-join ONCE, own the cache: the same
        # persisted FRESH rows (ids absent from the stored index — replay /
        # re-crawl idempotency) drive the pair kernel (new_feat_is_fresh
        # skips the kernel's own anti-join, which would re-scan the index id
        # column for the same answer) and the index append, and are released
        # here — no kernel-internal cache survives the batch (the first
        # batch runs the SAME kernel against an empty index: its pairs are
        # exactly the batch-internal new-new side).
        fresh = (minhash_features(batch_df, n_hashes, shingle_k,
                                  id_col, text_col)
                 .join(index.select("id"), "id", "left_anti").persist())
        pairs, _ = minhash_lsh_pairs_incremental(
            batch_df, index, n_hashes=n_hashes, bands=bands,
            shingle_k=shingle_k, threshold=threshold,
            max_bucket=max_bucket, id_col=id_col, text_col=text_col,
            new_feat=fresh, new_feat_is_fresh=True)
        # dynamic partition overwrite: only partitions PRESENT in the written
        # data are replaced, so a replay-before-grow rewrites batch_id=<n>
        # with identical content, while a replay-after-grow (fresh side
        # empty -> zero pair rows) touches NO partition and the original
        # commit stands — a plain subdir overwrite would wipe it. Corollary:
        # the pairs root materializes on the first NONEMPTY batch; readers
        # that must tolerate an all-empty stream should supply a schema.
        (pairs.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(pairs_path))
        # index append AFTER the pair write so this batch never pairs against
        # itself twice (in-batch pairs come from the kernel's new-new side);
        # appending the already-anti-joined fresh rows keeps a crash-replay
        # (or a re-delivered id) from stacking duplicate (id, grams, sig)
        # rows into the index, which would fan out the verify-join's grams
        # side for those ids in every later batch.
        fresh.write.mode("append").parquet(index_path)
        fresh.unpersist()

    def attach(stream_df: DataFrame):
        return (stream_df.writeStream
                .foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    attach.write_batch = write_batch  # direct handle for replay testing
    return attach


def dedup_monitor_stored(store_root: str, pairs_path: str,
                         checkpoint_dir: str, threshold: float = 0.7,
                         n_hashes: int = 48, bands: int = 8,
                         shingle_k: int = 5, max_bucket: int = 64,
                         id_col: str = "doc_id", text_col: str = "text"):
    """:func:`dedup_monitor` on an :class:`~owl2jsonschema_js_spark.
    operators.lsh_store.LshIndexStore` backend — identical pair semantics
    (proven in tests/test_lsh_store.py), different stored-side cost: the
    plain monitor re-reads the stored signature arrays and re-computes band
    keys over the whole corpus every micro-batch, while the store keeps the
    band keys as a narrow (band_no, bucket, id) table, so each batch's
    stored-side work is one 3-int-column scan plus a candidate-grams join —
    the posture that holds when the corpus index is 100 TB and batches land
    every few minutes.

    Same replay story as the plain monitor, enforced through the store's
    two-phase prepare/grow API: pairs are committed BEFORE the store grows,
    so no crash point can lose a batch's pairs, and the commit is an
    overwrite of that batch's ``batch_id=<n>`` partition — a replay that
    crashed between the pairs write and the grow regenerates the identical
    pair set (the store hasn't grown) and rewrites the same partition
    instead of stacking a duplicate copy, while a replay after the grow
    prepares an empty fresh side and overwrites nothing. Exactly-once pairs
    under foreachBatch replay, same as the Iceberg MERGE the layout maps to
    at cluster scale. Growing first would invert this into silent pair LOSS
    on replay."""
    from owl2jsonschema_js_spark.operators.lsh_store import LshIndexStore

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        store = LshIndexStore(
            batch_df.sparkSession, store_root, n_hashes=n_hashes,
            bands=bands, shingle_k=shingle_k, threshold=threshold,
            max_bucket=max_bucket, id_col=id_col, text_col=text_col)
        pairs, fresh = store.prepare(batch_df)
        (pairs.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(pairs_path))
        store.grow(fresh)

    def attach(stream_df: DataFrame):
        return (stream_df.writeStream
                .foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    attach.write_batch = write_batch
    return attach
