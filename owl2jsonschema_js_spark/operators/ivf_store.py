"""Persisted, incrementally-growable IVF index — the ANN serving analog of
:class:`~owl2jsonschema_js_spark.operators.lsh_store.LshIndexStore`.

The in-memory lanes (:func:`~owl2jsonschema_js_spark.operators.similarity.
ivf_topk_batch`) re-train the coarse quantizer and re-assign every vector on
every call — fine for one-shot jobs, wrong for a serving corpus that grows
by increments and answers query batches every few minutes. This store keeps:

 * ``<root>/centroids`` — the coarse quantizer, O(n_centroids × dim) rows
   (kilobytes; read to the driver per operation),
 * ``<root>/postings``  — (vec_id, embedding) parquet PARTITIONED BY
   list_id, so a query that probes `nprobe` of `n_centroids` lists prunes
   the scan to those partition directories — the on-disk realization of the
   IVF scan saving (plan-gated in tests: the parquet scan's partition filter
   carries list_id).

Scale posture: queries read only probed partitions and score with one
(batch × M) GEMM per Arrow batch (the probe-mask discipline of
ivf_topk_batch); increments assign with one GEMM per batch and append only
their own rows (id-anti-joined — replay/re-crawl idempotent, same contract
as the LSH store); the quantizer is trained ONCE at create and deliberately
NOT retrained by increments (retraining re-shuffles the whole postings
table; a drifted corpus shows up in :meth:`stats` list-size skew and is
fixed by an explicit :meth:`create` rebuild, never silently).

Reference scope: the reference (redaktor/owl2jsonschema.js) has no ANN
surface; this extends SURVEY §2.3's similarity-search mandate with the
persisted-index shape a 100 TB embedding corpus requires. Semantics follow
the public IVF literature (inverted-file coarse quantization, Jégou et al.).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.operators.similarity import (_assign_udf,
                                                          ivf_train_centroids)

__all__ = ["IvfIndexStore"]


class IvfIndexStore:
    """Parquet-backed IVF index (Iceberg tables at cluster scale — same
    TableIO story as the LSH store). All methods are driver-cheap: the only
    driver state is the centroid matrix (kilobytes).

    Crash consistency: the quantizer and the assignments MUST come from the
    same build — a crash between writing new centroids and re-assigned
    postings would leave queries pruning by one quantizer over lists chosen
    by another, a silent recall hole. Each :meth:`create` therefore writes
    into a fresh ``epoch=<k>`` directory and COMMITS it by appending one row
    to the ``epochs`` log LAST (a Spark append is job-committed: a crash
    mid-build leaves no log row, and readers keep serving the previous
    epoch; a half-written epoch directory is simply never referenced). At
    cluster scale the epoch commit maps to an Iceberg snapshot commit.
    Increments append postings INSIDE the current epoch — append is
    job-atomic and id-anti-joined, so any crash/replay point is safe."""

    def __init__(self, spark: SparkSession, root: str,
                 n_centroids: int = 16, train_iters: int = 2, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.epochs_path = f"{self.root}/epochs"
        self.n_centroids = n_centroids
        self.train_iters = train_iters
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col

    def _epoch(self) -> int:
        from pyspark.errors import AnalysisException
        try:
            row = (self.spark.read.parquet(self.epochs_path)
                   .agg(F.max("epoch").alias("e")).first())
        except AnalysisException:
            raise ValueError(
                f"no committed epoch under {self.root!r} — run create() "
                "first (a crashed create leaves no commit row by design)")
        return int(row["e"])

    @property
    def postings_path(self) -> str:
        return f"{self.root}/epoch={self._epoch()}/postings"

    # Multi-read operations MUST resolve the epoch ONCE and read every table
    # from it — resolving per-read would let a concurrent create() commit in
    # between, pairing one epoch's quantizer with another's assignments (the
    # exact torn state the epoch commit exists to prevent).
    def _centroids_at(self, epoch: int) -> np.ndarray:
        rows = (self.spark.read
                .parquet(f"{self.root}/epoch={epoch}/centroids")
                .orderBy("list_id").collect())
        return np.stack([np.asarray(r["centroid"], dtype=np.float64)
                         for r in rows])

    def _postings_at(self, epoch: int) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/epoch={epoch}/postings")

    # ------------------------------------------------------------- lifecycle
    def create(self, emb: DataFrame) -> None:
        """Train the quantizer on ``emb`` and build both tables into a NEW
        epoch, committed last. This is the only operation that moves the
        whole corpus — increments never re-assign stored vectors."""
        try:
            k = self._epoch() + 1
        except ValueError:
            k = 1
        cents = ivf_train_centroids(emb, self.n_centroids, self.train_iters,
                                    self.seed, self.id_col, self.vec_col)
        rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
        (self.spark.createDataFrame(rows, "list_id int, centroid array<double>")
         .coalesce(1)
         .write.mode("overwrite").parquet(f"{self.root}/epoch={k}/centroids"))
        (self._assigned(emb, cents)
         .write.mode("overwrite").partitionBy("list_id")
         .parquet(f"{self.root}/epoch={k}/postings"))
        # the COMMIT: one appended row; everything above is invisible until
        # this lands, and a crash before it leaves the previous epoch serving
        (self.spark.createDataFrame([(k,)], "epoch int")
         .coalesce(1).write.mode("append").parquet(self.epochs_path))

    def increment(self, new_emb: DataFrame) -> int:
        """Assign ``new_emb`` to the EXISTING lists and append; already-
        indexed ids are anti-joined out (replay / re-crawl idempotency).
        Returns the number of appended rows. The quantizer is not retrained
        — centroid drift surfaces in :meth:`stats`, not in silent reshuffles.
        """
        epoch = self._epoch()  # pin: quantizer + postings from ONE epoch
        cents = self._centroids_at(epoch)
        fresh = (self._assigned(new_emb, cents)
                 .join(self._postings_at(epoch).select(self.id_col),
                       self.id_col, "left_anti")
                 .localCheckpoint(eager=True))  # pin: counted AND written
        n = fresh.count()
        if n:
            fresh.write.mode("append").partitionBy("list_id") \
                .parquet(f"{self.root}/epoch={epoch}/postings")
        return n

    # ----------------------------------------------------------------- query
    def query(self, query_vecs, k: int = 5, nprobe: int = 4,
              ids=None) -> DataFrame:
        """Batched top-k over the stored postings: M queries in ONE pruned
        scan. Probe lists resolve on the driver against the (tiny) centroid
        table; the postings scan carries ``list_id IN (...)`` as a PARTITION
        filter, so unprobed lists are never read off disk — the IVF saving
        realized at the storage layer, not just in compute. Scoring is the
        probe-mask GEMM of ivf_topk_batch. Output:
        (query_id, vec_id, score, rank), rank 1..k per query.

        ``ids`` labels the results with the CALLER's query ids (one per
        vector, emitted directly from the scoring pass — int or string).
        Without it, query_id is the POSITION in ``query_vecs`` (0..M-1) —
        positions silently collide with real corpus ids if a caller joins
        them against its own tables, so pass ids whenever you have them
        (the CLI does). With ``ids=[]``/no queries the empty frame types
        query_id from the ids dtype (int when positional or unknowable)."""
        epoch = self._epoch()  # pin: quantizer + postings from ONE epoch
        vecs = [np.asarray(q, dtype=np.float64) for q in query_vecs]
        ids_arr = None
        qid_t = "int"
        if ids is not None:
            ids = list(ids)
            if len(ids) != len(vecs):
                raise ValueError(
                    f"ids/query_vecs length mismatch: {len(ids)} ids for "
                    f"{len(vecs)} vectors")
            if ids:
                # spark's own inference types the query_id column (bigint
                # for python ints, string for strings) — one authority for
                # both the empty-return and the mapInPandas schema
                qid_t = (self.spark.createDataFrame([(x,) for x in ids])
                         .schema[0].dataType.simpleString())
                ids_arr = np.asarray(ids, dtype=object)
        postings = self._postings_at(epoch)  # one reader: dtype + scan below
        id_t = postings.schema[self.id_col].dataType.simpleString()
        out_schema = f"query_id {qid_t}, {self.id_col} {id_t}, score double"
        if not vecs:
            return self.spark.createDataFrame([], out_schema + ", rank int")
        Q = np.stack(vecs)
        cents = self._centroids_at(epoch)
        cn = cents / np.clip(np.linalg.norm(cents, axis=1, keepdims=True),
                             1e-12, None)
        qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
        nprobe = min(nprobe, len(cents))
        order = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]     # (M, nprobe)
        probe_lists = sorted({int(l) for row in order for l in row})
        mask = np.zeros((len(cents), len(Q)), dtype=bool)        # (lists, M)
        for j, lists in enumerate(order):
            mask[lists, j] = True

        id_col, vec_col, q_b, mask_b = self.id_col, self.vec_col, Q, mask
        ids_b = ids_arr

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                s = m @ q_b.T                                    # (batch, M)
                rows, qs = np.nonzero(mask_b[pdf["list_id"].to_numpy()])
                yield pd.DataFrame({
                    "query_id": (qs.astype("int32") if ids_b is None
                                 else ids_b[qs]),
                    id_col: pdf[id_col].to_numpy()[rows],
                    "score": s[rows, qs],
                })

        cands = (postings
                 .where(F.col("list_id").isin(probe_lists))  # partition prune
                 .select(self.id_col, self.vec_col, "list_id")
                 .mapInPandas(score, out_schema))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.col(self.id_col))
        return (cands.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))

    # ----------------------------------------------------------- observation
    def centroids(self) -> np.ndarray:
        return self._centroids_at(self._epoch())

    def stats(self) -> dict:
        """List-size profile — the skew observability that tells an operator
        the quantizer has drifted (one list absorbing the corpus) and a
        rebuild is due. O(n_centroids) driver rows."""
        sizes = {r["list_id"]: r["n"] for r in
                 self._postings().groupBy("list_id")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        total = sum(sizes.values())
        return {"n_lists": len(sizes), "n_vectors": total,
                "max_list": max(sizes.values(), default=0),
                "max_list_frac": (max(sizes.values(), default=0) / total
                                  if total else 0.0),
                "sizes": sizes}

    # ------------------------------------------------------------- internals
    def _postings(self) -> DataFrame:
        return self.spark.read.parquet(self.postings_path)

    def _assigned(self, emb: DataFrame, cents: np.ndarray) -> DataFrame:
        par = emb.sparkSession.sparkContext.defaultParallelism
        return (emb.repartition(par)
                .select(F.col(self.id_col), F.col(self.vec_col),
                        _assign_udf(cents)(F.col(self.vec_col))
                        .alias("list_id")))
