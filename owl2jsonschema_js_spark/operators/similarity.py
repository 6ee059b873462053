"""Similarity search over an embedding column (array<float>).

 * :func:`topk_neighbors` — brute-force baseline: dot/cosine against a literal
   query vector, global top-k. Spark compiles the ORDER BY + LIMIT into
   TakeOrderedAndProject (per-partition top-k, then a k-row merge on the
   driver) — already the right distributed plan; no full sort happens.
 * :func:`pairs_above` — all pairs >= threshold via brute cross join
   (correctness baseline; quadratic — small inputs only).
 * :func:`rhp_lsh_pairs` — the scale path: random-hyperplane LSH. Signatures
   computed by a vectorized pandas_udf (one numpy matmul per Arrow batch),
   banded sign-bits -> bucket join -> exact score on candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from owl2jsonschema_js_spark.functions.vectors import cosine, dot, l2norm


def topk_neighbors(
    emb: DataFrame, query_vec: list[float], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    metric: str = "dot", exclude_id=None,
) -> DataFrame:
    """(id, score) of the k nearest rows to `query_vec`."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = dot(F.col(vec_col), q) if metric == "dot" else cosine(F.col(vec_col), q)
    out = emb.select(F.col(id_col), score.alias("score"))
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def pairs_above(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding", metric: str = "cosine",
) -> DataFrame:
    a = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    fn = dot if metric == "dot" else cosine
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", fn(F.col("va"), F.col("vb")).alias("score"))
        .where(F.col("score") >= threshold)
    )


def _assign_udf(cents: np.ndarray):
    """pandas_udf assigning each vector to its nearest centroid by cosine —
    one numpy GEMM per Arrow batch."""
    cn = cents / np.clip(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12, None)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        mn = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        return pd.Series(np.argmax(mn @ cn.T, axis=1).astype("int32"))

    return assign


def ivf_train_centroids(
    emb: DataFrame, n_centroids: int = 16, iters: int = 2, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd k-means for the IVF coarse quantizer.

    Init: deterministic hash-sampled rows. Each iteration: assignment is one
    GEMM per Arrow batch (executors), mean-update is posexplode ->
    groupBy(list, dim).avg — a partial-aggregating shuffle of
    O(n_centroids × dim) result rows; centroids (kilobytes) live on the
    driver between iterations, exactly how a cluster-scale IVF build stages
    its quantizer. Empty clusters keep their previous centroid."""
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    rng_rows = (base.withColumn("__h", F.xxhash64("id", F.lit(seed)))
                .orderBy("__h").limit(n_centroids).collect())
    cents = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rng_rows])
    par = emb.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(par)
    for _ in range(max(0, iters)):
        assigned = base.select(_assign_udf(cents)(F.col("v")).alias("list_id"), "v")
        means = (assigned.select("list_id", F.posexplode("v").alias("dim", "x"))
                 .groupBy("list_id", "dim").agg(F.avg("x").alias("m"))
                 .collect())
        new = cents.copy()  # empty clusters keep their previous centroid
        for r in means:
            new[r["list_id"], r["dim"]] = r["m"]
        cents = new
    return cents


def ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 5,
    n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    exclude_id=None, train_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) top-k: the scale path past brute force.

    Coarse quantizer: hash-sampled centroids, optionally refined with
    ``train_iters`` Lloyd iterations (:func:`ivf_train_centroids`). Every
    vector is assigned to its nearest centroid with ONE numpy GEMM per Arrow
    batch; the query scans only the `nprobe` nearest lists, so scan cost
    drops by ~n_centroids/nprobe while recall stays high for clustered data.
    """
    cents = ivf_train_centroids(emb, n_centroids, train_iters, seed,
                                id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    cn = cents / np.clip(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12, None)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_lists = np.argsort(-(cn @ qn))[:nprobe].tolist()

    par = emb.sparkSession.sparkContext.defaultParallelism
    assigned = emb.repartition(par).select(
        F.col(id_col), F.col(vec_col),
        _assign_udf(cents)(F.col(vec_col)).alias("list_id"))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    out = (assigned.where(F.col("list_id").isin(probe_lists))
           .select(F.col(id_col), dot(F.col(vec_col), qcol).alias("score")))
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def ivf_topk_batch(
    emb: DataFrame, query_vecs, k: int = 5,
    n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """Batched IVF ANN: M query vectors answered in ONE scan of the table.

    The serving shape that matters at 100 TB: per-query scans cost M table
    passes; here the coarse quantizer is trained once, every row is assigned
    to its list with one GEMM per Arrow batch, and the same pass scores the
    row against exactly the queries probing that row's list (one
    (batch x M) GEMM + a boolean probe mask — no per-row Python, no
    candidate that wasn't list-matched). Per-query top-k comes from a
    rank-window over the candidate set, which is ~(nprobe/n_centroids) of
    |table| x M rather than the full cross product.

    Output: (query_id, vec_id, score, rank), rank 1..k per query.
    """
    from pyspark.sql import Window

    Q = np.stack([np.asarray(q, dtype=np.float64) for q in query_vecs])
    cents = ivf_train_centroids(emb, n_centroids, train_iters, seed,
                                id_col, vec_col)
    cn = cents / np.clip(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12, None)
    qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
    # probe mask: list l serves query j iff l is among j's nprobe nearest
    order = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]        # (M, nprobe)
    mask = np.zeros((len(cents), len(Q)), dtype=bool)           # (lists, M)
    for j, lists in enumerate(order):
        mask[lists, j] = True
    cn_b, q_b, mask_b = cn, Q, mask

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
            lists = np.argmax(mn @ cn_b.T, axis=1)              # (batch,)
            s = m @ q_b.T                                       # (batch, M)
            rows, qs = np.nonzero(mask_b[lists])                # probed pairs only
            yield pd.DataFrame({
                "query_id": qs.astype("int32"),
                id_col: pdf[id_col].to_numpy()[rows],
                "score": s[rows, qs],
            })

    par = emb.sparkSession.sparkContext.defaultParallelism
    # id keeps its SOURCE dtype (string/int/long corpora all valid — the
    # hardcoded `long` here used to break non-bigint ids at Arrow transfer)
    id_t = emb.schema[id_col].dataType.simpleString()
    cands = emb.repartition(par).select(id_col, vec_col).mapInPandas(
        score, f"query_id int, {id_col} {id_t}, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (cands.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def rhp_lsh_pairs(
    emb: DataFrame, threshold: float = 0.8,
    n_planes: int = 32, bands: int = 4, dim: int = 64, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH near-neighbor pairs, exact-verified.

    sign(V @ P) gives an n_planes-bit signature whose per-bit collision
    probability is 1 - theta/pi; banding the bits yields candidate buckets.
    The matmul runs in a pandas_udf (Arrow batch -> one numpy GEMM)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
    rows_per_band = n_planes // bands

    @pandas_udf("array<int>")
    def band_keys(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())            # (batch, dim)
        bits = (m @ planes) > 0               # (batch, n_planes)
        out = []
        weights = 1 << np.arange(rows_per_band)
        for r in bits:
            out.append([int(r[b * rows_per_band:(b + 1) * rows_per_band] @ weights)
                        for b in range(bands)])
        return pd.Series(out)

    # signature matmul is compute-bound: spread rows even from a 1-file source
    par = emb.sparkSession.sparkContext.defaultParallelism
    base = emb.repartition(par).select(F.col(id_col).alias("id"),
                                       F.col(vec_col).alias("v"))
    # (id, band, bucket) ONLY rides the pair-generating self-join — wide
    # vectors are re-joined after candidate dedup (same discipline as
    # minhash_lsh_pairs). localCheckpoint, NOT persist: the checkpointed RDD
    # still computes the pandas_udf signature pass once across both join
    # sides, but it is released by the ContextCleaner when the returned
    # DataFrame is garbage-collected — persist() would pin both frames in
    # the CacheManager for the session with no release handle, leaking one
    # cached copy of the embedding table per call in long-lived sessions
    # (the defect class the incremental-dedup kernel fixed in round 4;
    # semantic_dedup_survivors calls this per corpus pass).
    keyed = base.select(
        "id", F.posexplode(band_keys(F.col("v"))).alias("band_no", "bucket")
    ).localCheckpoint(eager=False)
    a, b = keyed.alias("a"), keyed.alias("b")
    cands = (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    # norms precomputed per id (once), not per candidate pair; lazy
    # localCheckpoint for the same GC-released lifetime as `keyed`
    vecs = base.withColumn("nrm", l2norm(F.col("v"))).localCheckpoint(eager=False)
    va = vecs.select(F.col("id").alias("a_id"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
    vb = vecs.select(F.col("id").alias("b_id"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"))
    score = dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    return (cands.join(va, "a_id").join(vb, "b_id")
            .select("a_id", "b_id", score.alias("score"))
            .where(F.col("score") >= threshold))
