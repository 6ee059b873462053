"""Deduplication operators over a documents table (doc_id, text, ...).

Training-data-pipeline operators, Spark-first:

 * :func:`exact_dups` — hash-groupBy on the text itself (Catalyst partial agg).
 * :func:`ngram_jaccard_pairs` — EXACT n-gram-set Jaccard via an inverted-index
   token join (explode -> join on token -> shared counts), NOT an all-pairs
   cross join: pairs sharing zero n-grams are never materialized, which is the
   property that survives a 100× scale-up. Jaccard = sh / (|A|+|B|-sh).
 * :func:`minhash_lsh_pairs` — MinHash signatures (fused shingle-hash +
   multiply-shift lane-min, one vectorized numpy pass per Arrow batch) banded
   into LSH buckets; candidate pairs from same-bucket joins, then
   exact-Jaccard verification of candidates only.
 * :func:`simhash_pairs` — 64-bit SimHash from token hashes (bit-sum
   aggregation, all JVM expressions), near-dup candidates from 16-bit band
   collisions, verified by Hamming distance.

No per-row Python anywhere: everything is either JVM column expressions or
Arrow-batched vectorized pandas_udfs.
"""

from __future__ import annotations

import functools
import operator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def ws_strip(col):
    """Strip ALL leading/trailing whitespace — ``F.trim`` strips spaces only,
    so tab/newline-padded text would otherwise mint an empty first/last token
    out of the ``\\s+`` tokenizer (off-by-one token counts, ''-prefixed
    n-grams). Every tokenizing operator routes through this; the DuckDB
    oracle twin is ``regexp_replace(text, '^\\s+|\\s+$', '', 'g')``."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def tokens_col(text_col: str = "text", distinct: bool = True):
    t = F.split(ws_strip(F.col(text_col)), r"\s+")
    return F.array_distinct(t) if distinct else t


def word_ngrams_col(n: int, text_col: str = "text"):
    """Distinct word n-grams as an array column (n=1 -> distinct tokens)."""
    toks = F.split(ws_strip(F.col(text_col)), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    # slide a window of n over the token array; join with spaces
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))


def char_shingles_col(k: int = 5, text_col: str = "text"):
    """Distinct character k-shingles (classic MinHash input)."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, F.lit(k))))


def exact_dups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text, n_dups) for texts appearing more than
    once. Hash aggregation with map-side combine; at scale, group on
    xxhash64(text) first to shrink shuffle width."""
    return (
        docs.groupBy(F.col(text_col).alias("text"))
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def _pair_jaccard(grams: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """grams: (id, gram array) -> exact Jaccard per co-occurring pair via
    inverted-index join. Output: (a_id, b_id, jaccard)."""
    tok = grams.select(F.col(id_col).alias("id"), F.explode("grams").alias("g"))
    sizes = grams.select(F.col(id_col).alias("id"), F.size("grams").alias("ns"))
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    return (
        shared
        .join(sizes.withColumnsRenamed({"id": "a_id", "ns": "na"}), "a_id")
        .join(sizes.withColumnsRenamed({"id": "b_id", "ns": "nb"}), "b_id")
        .select(
            "a_id", "b_id",
            (F.col("sh").cast("double")
             / (F.col("na") + F.col("nb") - F.col("sh"))).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 2, threshold: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a_id, b_id, jaccard) for word-n-gram Jaccard >= threshold."""
    grams = docs.select(F.col(id_col), word_ngrams_col(n, text_col).alias("grams"))
    return _pair_jaccard(grams, id_col).where(F.col("jaccard") >= threshold)


def minhash_features(
    docs: DataFrame,
    n_hashes: int = 48,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, grams, sig): distinct shingle-hash set + MinHash signature per
    document — the persistable dedup INDEX (at corpus scale this is the table
    you checkpoint/store and feed to :func:`minhash_lsh_pairs_incremental`
    when the next crawl increment arrives).

    Shingle-hash + signature FUSED into one Arrow-batched vectorized pass:
    byte k-grams via a sliding-window dot with base powers (one windowed
    matmul per doc, as in winnow_fingerprints), np.unique for the distinct
    shingle-hash set, then an (n_grams x n_hashes) multiply-shift universal
    hash column-min for the signature. The previous all-JVM expression
    formulation (transform/substring/xxhash64 + aggregate-of-transform
    lanes) stays on the JVM but is *interpreted*, not codegen'd — measured
    ~19s vs ~3s on 5k docs for this fused numpy version. Jaccard over hashed
    byte shingles equals Jaccard over shingles modulo 64-bit collisions.
    Seeds are fixed module constants, so a document's signature is identical
    whether computed in a batch run or an incremental one.

    Shingle-less docs (null/short text) are dropped: they can't near-dup and
    would all share the empty signature -> one giant bucket + 0/0 Jaccard;
    exact_dups owns exact-empty duplicates."""
    rng = np.random.default_rng(0x5EED)
    mul = (rng.integers(1, 1 << 62, size=n_hashes, dtype=np.uint64) << 1) + 1  # odd
    add = rng.integers(0, 1 << 63, size=n_hashes, dtype=np.uint64)
    empty_sig = np.full(n_hashes, (1 << 63) - 1, dtype=np.int64)
    base_pows = (np.uint64(131) ** np.arange(shingle_k, dtype=np.uint64))[::-1].copy()
    mix = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiply to spread hashes

    @pandas_udf("grams array<bigint>, sig array<bigint>")
    def feats(texts: pd.Series) -> pd.DataFrame:
        grams_out, sig_out = [], []
        for t in texts.fillna(""):
            b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
            if b.size < shingle_k:
                grams_out.append(np.empty(0, dtype=np.int64))
                sig_out.append(empty_sig)
                continue
            win = np.lib.stride_tricks.sliding_window_view(b, shingle_k)
            h = np.unique((win.astype(np.uint64) @ base_pows) * mix)
            grams_out.append(h.view(np.int64))
            m = h[:, None] * mul[None, :] + add  # uint64 wraparound hashing
            sig_out.append(m.min(axis=0).view(np.int64))
        return pd.DataFrame({"grams": grams_out, "sig": sig_out})

    # shingling+hashing is compute-bound (~n_hashes * len(text) hash ops/doc):
    # spread rows across cores even when the source is one small file/partition
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (docs.repartition(par)
            .select(F.col(id_col).alias("id"), feats(F.col(text_col)).alias("f"))
            .select("id", "f.grams", "f.sig")
            .where(F.size("grams") > 0))


def _banded(feat: DataFrame, n_hashes: int, bands: int,
            carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, band_no, bucket [, *carry]) band keys from a signature table —
    bucket = xxhash64 over each band's signature rows."""
    rows_per_band = n_hashes // bands
    return feat.select(
        "id", *carry,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_no"),
                     F.xxhash64(F.lit(b),
                                F.slice("sig", b * rows_per_band + 1, rows_per_band))
                     .alias("bucket"))
            for b in range(bands)])).alias("bb"),
    ).select("id", *carry, "bb.band_no", "bb.bucket")


def _verify_jaccard(cands: DataFrame, grams: DataFrame,
                    threshold: float) -> DataFrame:
    """Exact Jaccard over the hashed-shingle sets, joined AFTER candidate
    dedup so wide gram arrays never ride the pair-generating shuffle."""
    ga = grams.select(F.col("id").alias("a_id"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("id").alias("b_id"), F.col("grams").alias("gb"))
    j = (F.size(F.array_intersect("ga", "gb")).cast("double")
         / F.size(F.array_union("ga", "gb")))
    return (cands.join(ga, "a_id").join(gb, "b_id")
            .select("a_id", "b_id", j.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 48,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    Pipeline: :func:`minhash_features` (fused shingle-hash + signature) ->
    band keys = xxhash64 over each band's rows -> same-bucket join for
    candidates (the ONLY pair-generating step) -> exact Jaccard on candidates
    only. With b bands of r rows the usual S-curve applies:
    P(candidate) = 1-(1-j^r)^b. Defaults b=8, r=6 put the S-curve knee
    (1/b)^(1/r) ~= 0.71 at the default threshold — below-threshold pairs
    mostly never become candidates (measured 79k -> ~8k candidates on 5k
    templated docs vs r=4), which is what bounds the self-join at scale.

    Scale guards (both essential at 100 TB):
      * buckets larger than ``max_bucket`` are DROPPED before the self-join —
        a hot bucket is quadratic in its size and carries little signal
        (boilerplate/templated text); this bounds the join at
        O(buckets * max_bucket^2). Dropped mass is observable via
        bucket-size stats, not silently unbounded work.
      * the band join carries only (id, band, bucket); shingle arrays are
        re-joined AFTER candidate dedup, so wide arrays never ride the
        pair-generating shuffle."""
    assert n_hashes % bands == 0
    # persist: this subtree feeds 6 DAG branches (bucket sizes, both self-join
    # sides, both verify sides); without persist Spark re-executes it per
    # branch. At cluster scale this intermediate would be checkpointed to a
    # signatures table instead (minhash_features is that table's generator).
    feat = minhash_features(docs, n_hashes, shingle_k, id_col, text_col).persist()
    cands = _candidate_pairs(_banded(feat, n_hashes, bands), max_bucket)
    return _verify_jaccard(cands, feat.select("id", "grams"), threshold)


def _candidate_pairs(banded: DataFrame, max_bucket: int,
                     extra_pred=None) -> DataFrame:
    """Bucket-capped same-bucket self-join -> deduped (a_id, b_id) candidate
    pairs — the ONE pair-generating stage, shared by the batch and
    incremental lanes (``extra_pred(a, b)`` adds the incremental lane's
    >=1-new-side restriction to the join condition itself)."""
    bucket_sizes = banded.groupBy("band_no", "bucket").agg(F.count(F.lit(1)).alias("bc"))
    small = banded.join(bucket_sizes.where(F.col("bc") <= max_bucket),
                        on=["band_no", "bucket"])
    a, b_ = small.alias("a"), small.alias("b")
    cond = ((F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")))
    if extra_pred is not None:
        cond = cond & extra_pred(a, b_)
    return (a.join(b_, cond)
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .dropDuplicates(["a_id", "b_id"]))


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    n_hashes: int = 48,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    new_feat: DataFrame | None = None,
    new_feat_is_fresh: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup detection: new documents against an existing
    corpus INDEX — the production shape when a crawl increment lands daily
    and the already-deduped corpus is 100 TB.

    ``index`` is a (id, grams, sig) table from :func:`minhash_features` (or a
    previous incremental call) — at scale a stored/checkpointed table, so the
    old corpus is never re-shingled. Only NEW documents pay the signature
    pass, and the bucket join is restricted to pairs with at least one new
    side: old-old pairs (already handled in prior runs) are structurally
    excluded from the join output, not filtered after the fact. Bucket sizes
    are computed over old+new together, so a boilerplate bucket that grew
    past ``max_bucket`` only via the increment is still guarded.

    Returns ``(pairs, new_index)``: pairs = (a_id, b_id, jaccard) with at
    least one new id per pair; new_index = old index ∪ new features, ready
    to store for the next increment.

    Replay idempotency: increment rows whose id ALREADY exists in the index
    are dropped (id-width left_anti) before anything else — a re-delivered
    batch (the foreachBatch crash-replay case) or a re-crawled id neither
    duplicates index rows (which would multiply verified pair rows on every
    later run) nor re-emits its pairs. Ids are therefore assumed
    content-stable; changed content under a reused id needs an explicit
    delete+reinsert.

    Cache posture (the at-scale constraint drives it): only the INCREMENT's
    features are materialized — the old-index side is re-scanned per
    consumer, because at 100 TB the index is a stored table you cannot cache
    and should not try to (a per-band bucket table, stored alongside the
    index, would cut those re-scans further; noted, not needed at this
    scale). When ``new_feat`` is not supplied, the internally-built fresh
    features are ``localCheckpoint(eager=True)``'d — increment-sized, one
    signature pass, lineage truncated, and the blocks are released by the
    ContextCleaner when the returned frames are garbage-collected, so
    long-lived sessions accumulate NO session-lifetime cache (the round-3
    internal ``persist()`` had no release handle and leaked one cached frame
    per call). Pass ``new_feat`` (a persisted :func:`minhash_features` frame
    for the SAME new_docs) to own the cache lifecycle yourself — the
    streaming monitor does this so each micro-batch releases exactly its own
    cache."""
    assert n_hashes % bands == 0
    own_feat = new_feat is None
    if own_feat:
        new_feat = minhash_features(new_docs, n_hashes, shingle_k,
                                    id_col, text_col)
    # replay idempotency: already-indexed ids contribute nothing new.
    # ``new_feat_is_fresh`` skips this when the caller ALREADY anti-joined
    # (the streaming monitor does, because it also appends the fresh rows
    # to the index) — otherwise the index id column would be scanned twice
    # per call for the same answer.
    if new_feat_is_fresh and not own_feat:
        fresh = new_feat.select("id", "grams", "sig")
    else:
        fresh = new_feat.select("id", "grams", "sig").join(
            index.select("id"), "id", "left_anti")
    if own_feat:
        # materialize the increment ONCE (it feeds the band join, the
        # verify join and new_index); eager localCheckpoint instead of
        # persist: same executor-memory residency, but auto-released on GC
        # rather than leaked until an explicit unpersist nobody owns
        fresh = fresh.localCheckpoint(eager=True)
    all_feat = (index.select("id", "grams", "sig")
                .withColumn("is_new", F.lit(False))
                .unionByName(fresh.withColumn("is_new", F.lit(True))))
    cands = _candidate_pairs(
        _banded(all_feat, n_hashes, bands, carry=("is_new",)), max_bucket,
        extra_pred=lambda a, b: F.col("a.is_new") | F.col("b.is_new"))
    pairs = _verify_jaccard(cands, all_feat.select("id", "grams"), threshold)
    new_index = index.select("id", "grams", "sig").unionByName(fresh)
    return pairs, new_index


def dup_clusters(pairs: DataFrame, max_iter: int = 20,
                 a_col: str = "a_id", b_col: str = "b_id",
                 defer_checks: int = 0,
                 stats: dict | None = None,
                 small_graph_max: int = 250_000) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id), where
    cluster_id is the component's minimum id.

    The step every dedup pipeline needs after pair generation: pairs are not
    deletable units — transitive groups are (a~b, b~c must collapse to ONE
    survivor even when (a,c) was never emitted). Each round does min-label
    propagation (every node adopts the min label among itself and its
    neighbors — one key-width join + groupBy over the EDGE list, never the
    docs table) followed by a POINTER JUMP (every node adopts its label's
    label), so a chain of diameter D converges in O(log D) rounds instead of
    O(D) — the distinction that matters when boilerplate text links long
    near-dup chains at corpus scale. Labels are ``localCheckpoint``ed every
    few rounds: iterative self-joins otherwise grow the logical plan
    per-round until analysis itself becomes the bottleneck (the classic
    Spark iterative-algorithm pitfall; persist caches data but does not
    truncate lineage). Convergence costs ONE narrow aggregate per round, not
    a join: per-id labels are monotonically non-increasing across rounds, so
    ``sum(label)`` (exact decimal — int64 would overflow at 10^12 ids) is
    unchanged between two rounds iff every label is unchanged — the
    fixed-point witness is a single scan of the cached label table.
    ``defer_checks`` rounds may additionally skip the check entirely (lazy
    evaluation folds deferred rounds into the next checked round's job) when
    the caller knows the graph is deep. Only ids that appear in some pair
    are returned (singletons are their own survivors by definition).

    ``stats``, if given, records {'rounds': n, 'mode': ...} — the number of
    label-update rounds executed (the O(log D) convergence contract is
    asserted on this in tests). The result is returned PERSISTED and
    materialized — call ``.unpersist()`` on it when done in long-lived
    sessions; every loop iterate is released before return.

    **Small-graph fast path**: post-LSH(+verify) pair sets are typically
    orders of magnitude smaller than the corpus; when the measured
    (symmetrized, distinct) edge count is at most ``small_graph_max``, the
    component labels are computed by a driver-side union-find instead of the
    iterative join loop — the distributed loop's per-round fixed cost (3
    joins + an agg × O(log D) rounds) is pure overhead in that regime (a
    477-node graph measured ~9s through the loop vs milliseconds through
    union-find). Driver state is bounded and documented: the edge list rides
    the Arrow path (``toPandas`` on the two narrow columns, unpacked to
    plain-scalar lists — never PySpark Row objects, whose per-row overhead
    would multiply the footprint several-fold), so the 250k default costs
    two ≤500k-scalar lists plus the union-find parent dict — tens of MB of
    plain ints/strs, the same O(small) discipline as the runner's ≤10k-key
    referential fold. ``defer_checks``
    is loop-only and ignored on this path; ``stats['mode']`` records which
    path ran ('driver' | 'distributed'), with 'rounds' = 0 for driver. Pass
    ``small_graph_max=0`` to force the distributed loop (tests protecting
    the O(log D) claim do). At 10^12-row scale pair sets can exceed any
    driver budget — the loop remains the default above the threshold. The
    250k constant is bench-justified (``bench_cc_crossover.py`` →
    ``BENCH/cc_diameter.md``): on post-LSH-shaped graphs the driver path is
    ~10× faster AT the threshold and stays ahead to ~1M edges (wall
    crossover between 1M and 4M), so the default is conservative on both
    axes — everything routed to the driver is faster there, and the refusal
    above 250k is a driver-state bound, not a performance one."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (e.unionByName(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
             .distinct().persist())
    n_edges = edges.count()  # one job; fills the cache both paths reuse
    if n_edges <= small_graph_max:
        # Arrow collect: two narrow columns to pandas, then .tolist() for
        # plain Python scalars (createDataFrame below rejects numpy types;
        # Rows would cost several× the memory at the 250k-edge bound)
        pdf = edges.toPandas()
        srcs, dsts = pdf["src"].tolist(), pdf["dst"].tolist()
        del pdf
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a0, b0 in zip(srcs, dsts):
            a, b = find(a0), find(b0)
            if a != b:
                if b < a:
                    a, b = b, a
                parent[b] = a  # union by min: roots stay component minima
        id_type = edges.schema["src"].dataType
        edges.unpersist()
        out_schema = T.StructType([T.StructField("id", id_type),
                                   T.StructField("cluster_id", id_type)])
        data = [(i, find(i)) for i in set(srcs)]
        if stats is not None:
            stats.update(rounds=0, mode="driver", n_edges=n_edges)
        final = pairs.sparkSession.createDataFrame(data, out_schema).persist()
        final.count()
        return final

    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")).persist())
    rounds = 0
    prev_sum = None  # sum(label) of the previous CHECKED round
    for it in range(max_iter):
        rounds = it + 1
        prop = (edges.join(labels.withColumnsRenamed({"id": "dst", "label": "nb"}),
                           "dst")
                .groupBy("src").agg(F.min("nb").alias("nb")))
        stepped = (labels.join(prop.withColumnRenamed("src", "id"), "id", "left")
                   .select("id", F.least(F.col("label"),
                                         F.coalesce(F.col("nb"), F.col("label")))
                           .alias("label")))
        # pointer jump through the PREVIOUS round's labels (path compression
        # with a stale parent table): jumping through `stepped` itself would
        # reference it twice and DOUBLE the logical plan every round —
        # exponential analysis cost that caching does not truncate; the
        # stale-parent jump keeps plan growth linear and still collapses
        # chains in O(log D) rounds (label[x] <= x is invariant, so the jump
        # target is always a valid, tighter component bound)
        parent = labels.select(F.col("label").alias("plabel"),
                               F.col("id").alias("label"))
        new = (stepped.join(parent, "label", "left")
               .select("id", F.least(F.coalesce(F.col("plabel"), F.col("label")),
                                     F.col("label"))
                       .alias("label")).persist())
        # convergence: one narrow agg over the (cached) new labels — also the
        # action that fills the persist. Monotone non-increasing labels make
        # the exact sum a fixed-point witness; the first checked round only
        # records its sum (nothing to compare against yet).
        checked = it >= defer_checks
        cur_sum = None
        if checked:
            # SQL sum over zero rows is NULL — an EMPTY label table (no pairs
            # at all) is trivially a fixpoint, so None must converge too, not
            # loop to max_iter over empty frames
            cur_sum = new.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).first()["s"]
        labels.unpersist()
        if (it + 1) % 4 == 0:
            # truncate the (linearly growing) lineage; runs AFTER the agg
            # materialized the cache so the checkpoint reads cached rows
            cp = new.localCheckpoint(eager=True)
            new.unpersist()
            new = cp
        labels = new
        if checked:
            if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
                break
            prev_sum = cur_sum
    edges.unpersist()
    if stats is not None:
        stats.update(rounds=rounds, mode="distributed", n_edges=n_edges)
    # deterministic ownership: materialize the final result as ITS OWN cached
    # frame, release every iterate, and hand the caller a DataFrame whose
    # .unpersist() actually frees it (an unpersist through a rename-projection
    # would not match the cached plan). Superseded mid-loop checkpoint RDDs
    # are tiny (one row per paired id) and reclaimed by the context cleaner.
    final = labels.withColumnRenamed("label", "cluster_id").persist()
    final.count()
    labels.unpersist()
    return final


def dedup_survivors(docs: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id", max_iter: int = 20,
                    priority_col=None) -> DataFrame:
    """Keep one document per near-dup cluster and every unpaired document.
    Implemented as a left_anti join of the docs table against the
    non-surviving cluster members — the docs table is never shuffled on
    anything but its id.

    Survivor policy:

    * default — the MIN-ID representative (the cluster label itself; zero
      extra work, stable under re-runs);
    * ``priority_col`` (a column name or Column expression over ``docs``,
      e.g. ``F.octet_length('text')`` or a quality score) — the member with
      the LARGEST priority survives, ties broken by largest id: real
      pipelines keep the longest / highest-quality copy, not the smallest
      id. Cost: one narrow (id, priority) join onto the cluster table + a
      per-cluster max — O(cluster members), never the corpus. NULL
      priorities lose to any non-NULL (struct ordering; tested).

    Cache ownership is internal: the loser-id set (ids only, tiny) is
    localCheckpoint'ed — materialized with truncated lineage — so the big
    cluster table from :func:`dup_clusters` is unpersisted HERE before
    returning; callers get a self-contained DataFrame and nothing leaks into
    long-lived sessions (the checkpoint RDD itself is reclaimed by the
    ContextCleaner once the result is garbage-collected)."""
    members = dup_clusters(pairs, max_iter=max_iter)
    if priority_col is None:
        losers = (members.where(F.col("id") != F.col("cluster_id"))
                  .select(F.col("id").alias(id_col))
                  .localCheckpoint(eager=True))
    else:
        pr = F.col(priority_col) if isinstance(priority_col, str) else priority_col
        scored = members.join(
            docs.select(F.col(id_col).alias("id"), pr.alias("__pr")), "id")
        winners = (scored.groupBy("cluster_id")
                   .agg(F.max(F.struct("__pr", "id")).alias("__w"))
                   .select(F.col("__w.id").alias("id")))
        losers = (members.join(winners, "id", "left_anti")
                  .select(F.col("id").alias(id_col))
                  .localCheckpoint(eager=True))
    members.unpersist()
    return docs.join(losers, id_col, "left_anti")


POLY_M1, POLY_M2 = 2147483647, 2147483629  # two 31-bit primes
POLY_B1, POLY_B2 = 131, 137


def poly_fold(t, base: int = POLY_B1, mod: int = POLY_M1):
    """One 31-bit polynomial string-hash lane: fold ``(acc*base + char) mod
    prime`` over the characters of ``t`` — plain int64 arithmetic, so an
    external SQL engine recomputes it exactly (the property xxhash64 lacks).
    DuckDB twin::

        list_reduce(list_prepend(0::BIGINT,
          list_transform(range(1, len(t)+1),
                         i -> ascii(substr(t, i, 1))::BIGINT)),
          (acc, c) -> (acc * {base} + c) % {mod})

    Interpreted (aggregate-over-chars) rather than an intrinsic: the
    oracle/deterministic lane, not the default hot path. Empty strings fold
    one zero char (== 0); NULL stays NULL."""
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
        F.lit(0).cast("long"),
        lambda acc, i: F.pmod(
            acc * base + F.coalesce(F.ascii(F.substring(t, i, F.lit(1))),
                                    F.lit(0)),
            F.lit(mod)))


def poly_token_hash(t):
    """62-bit SQL-reproducible token hash: two independent :func:`poly_fold`
    lanes (bases 131/137, distinct 31-bit prime moduli) packed as
    h1 * 2^31 + h2."""
    return (poly_fold(t, POLY_B1, POLY_M1) * F.lit(2147483648)
            + poly_fold(t, POLY_B2, POLY_M2))


def simhash_col(text_col: str = "text", bits: int = 64,
                token_hash: str = "xxhash"):
    """64-bit SimHash as a single JVM expression: sum over distinct tokens of
    (+1/-1) per bit of hash(token), then sign -> bit. aggregate() keeps it
    inside codegen — no shuffle, no Python.

    ``token_hash``: 'xxhash' (default, intrinsic) or 'poly' (62-bit
    SQL-reproducible polynomial hash — the oracle-graded lane; bits 62-63 are
    then structurally zero on both sides)."""
    toks = tokens_col(text_col)
    if token_hash == "poly":
        hashes = F.transform(toks, poly_token_hash)
    elif token_hash == "xxhash":
        hashes = F.transform(toks, lambda t: F.xxhash64(t))
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    # ONE aggregate pass with an array<long> accumulator (bits separate
    # aggregates would re-walk the token array `bits` times — measured 13.8s
    # vs ~1s on 5k docs): per token, add ±1 to every bit lane via an indexed
    # transform; then fold the sign array into the 64-bit code.
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    bit_sums = F.aggregate(
        hashes, zeros,
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v + F.when(F.getbit(h, i) == 1, F.lit(1))
                              .otherwise(F.lit(-1)).cast("long"),
        ),
    )
    # fold sign lanes into the 64-bit code: sum of distinct powers of two,
    # computed with a double pow (exact for 2^0..2^62) and bit 63 via sign
    bit_vals = F.transform(
        bit_sums,
        lambda v, i: F.when((v > 0) & (i < F.lit(bits - 1)),
                            F.pow(F.lit(2.0), i.cast("double")).cast("long"))
                      .otherwise(F.lit(0).cast("long")),
    )
    body = F.aggregate(bit_vals, F.lit(0).cast("long"), lambda acc, x: acc + x)
    top = F.when(F.element_at(bit_sums, bits) > 0,
                 F.lit(-(2 ** (bits - 1))).cast("long")).otherwise(F.lit(0).cast("long"))
    return body + top


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6, max_bucket: int = 256,
    id_col: str = "doc_id", text_col: str = "text",
    token_hash: str = "xxhash",
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of four 16-bit bands
    (any pair within Hamming<=3 of a band is guaranteed caught; wider distances
    probabilistically), verified by full Hamming distance. Buckets larger than
    ``max_bucket`` are dropped before the self-join (quadratic guard, same
    rationale as minhash_lsh_pairs)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    # persist: the interpreted simhash aggregate feeds both self-join sides
    sh = docs.repartition(par).select(
        F.col(id_col).alias("id"),
        simhash_col(text_col, token_hash=token_hash).alias("sim")).persist()
    bands = sh.select(
        "id", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_no"),
                     F.shiftright(F.col("sim"), 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
            for b in range(4)])).alias("bb"),
    ).select("id", "sim", "bb.band_no", "bb.bucket")
    sizes = bands.groupBy("band_no", "bucket").agg(F.count(F.lit(1)).alias("bc"))
    bands = bands.join(sizes.where(F.col("bc") <= max_bucket), on=["band_no", "bucket"])
    a, b_ = bands.alias("a"), bands.alias("b")
    return (
        a.join(b_, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
                hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"))
        .dropDuplicates(["a_id", "b_id"])
        .where(F.col("hamming") <= max_hamming)
    )


def semantic_dedup_survivors(
    emb: DataFrame, threshold: float = 0.9,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 32, bands: int = 4, dim: int = 64, seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Embedding-cosine near-dup survivors: the semantic twin of the text
    pipeline (minhash_lsh_pairs -> dup_clusters -> dedup_survivors), for
    paraphrase-level duplicates that shingle/token hashing cannot see.

    Pairs come from :func:`~owl2jsonschema_js_spark.operators.similarity.
    rhp_lsh_pairs` (banded sign-bit buckets, exact-cosine verification of
    candidates only — never all-pairs), transitive groups collapse via the
    same O(log D) :func:`dup_clusters`, and the input table is thinned by one
    ids-only left_anti join — so the wide vector column is scanned exactly
    once (the signature pass) and never rides a shuffle after candidate
    generation. Same 100 TB posture as the text lane; only the pair
    generator differs."""
    from owl2jsonschema_js_spark.operators.similarity import rhp_lsh_pairs

    pairs = rhp_lsh_pairs(emb, threshold=threshold, n_planes=n_planes,
                          bands=bands, dim=dim, seed=seed,
                          id_col=id_col, vec_col=vec_col)
    return dedup_survivors(emb, pairs, id_col=id_col, max_iter=max_iter)
