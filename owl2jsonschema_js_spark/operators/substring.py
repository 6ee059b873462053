"""Exact repeated-substring detection across documents — the span-level
dedup lane (public semantics: Lee et al., "Deduplicating Training Data Makes
Language Models Better", and Schleimer et al.'s winnowing): find every pair
of documents sharing a verbatim byte span of at least ``min_len``, with the
maximal span's exact offsets.

Shape (the suffix-array replacement that distributes):

 1. **Anchors** — per doc, rolling polynomial hashes of char ``k``-grams;
    winnowing selects the min-hash position of every sliding window of
    ``window = min_len - k + 1`` consecutive hashes. The winnowing guarantee
    makes detection EXACT, not probabilistic: any shared substring of length
    >= window + k - 1 = ``min_len`` contains at least one selected
    (hash, relative-position) pair on both sides — selection depends only on
    bytes inside the shared region. Anchor density is ~2/(window+1) of
    positions, so the exploded anchor table is a bounded fraction of corpus
    bytes.
 2. **Candidate pairs** — anchors self-join on hash (ids + positions only,
    no text rides the shuffle), with an LSH-style hot-bucket guard: a hash
    seen in more than ``max_bucket`` docs (boilerplate) is dropped and
    counted, preventing the quadratic blowup.
 3. **Verify + extend** — per candidate pair, both texts are fetched ONCE
    (key-width joins after pair-level dedup), and one Arrow pass extends
    each anchor to its maximal equal span (byte compare — hash collisions
    are verified away), deduplicating anchors that land inside an
    already-extended span on the same alignment diagonal, so total work per
    pair is O(anchors + matched bytes).

Positions are BYTE offsets of the UTF-8 encoding (exact for the ASCII
corpus; for multibyte text the span edges are still byte-exact but may split
a codepoint — callers slicing codepoints should round inward).

Deployment note: the anchor UDF references module-level kernels, so
executors must be able to import this package — ship it with
``spark-submit --py-files engine.zip`` (the repo's standard launch shape) or
set PYTHONPATH; plain local sessions launched from the repo root work as-is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_anchor_table", "substring_dups", "span_dedup_survivors"]

_B, _M = 131, (1 << 31) - 1  # polynomial base / 31-bit Mersenne modulus


def _weights(k: int) -> np.ndarray:
    w = np.empty(k, dtype=np.int64)
    acc = np.int64(1)
    for j in range(k - 1, -1, -1):
        w[j] = acc
        acc = (acc * _B) % _M
    return w


def _anchors_for_bytes(b: np.ndarray, k: int, window: int,
                       weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(positions, hashes) of winnowing-selected k-gram anchors for one byte
    string (int64 array) — one windowed matmul + windowed argmin, no
    per-character Python. Selection rule: first-minimum per window (content
    local, so two occurrences of the same substring select the same relative
    positions). Fuzz-pinned against a naive reference in tests."""
    if b.size < k:
        return (np.empty(0, dtype=np.int64),) * 2
    h = (np.lib.stride_tricks.sliding_window_view(b, k) @ weights) % _M
    if h.size <= window:
        p = np.array([int(h.argmin())])
    else:
        wv = np.lib.stride_tricks.sliding_window_view(h, window)
        p = np.unique(wv.argmin(axis=1) + np.arange(wv.shape[0]))
    return p, h[p]


def winnow_anchor_table(docs: DataFrame, k: int = 16, window: int = 35,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, pos, h): winnowing-selected k-gram anchors WITH byte positions —
    the positional sibling of ``textstats.winnow_fingerprints``. One windowed
    matmul + windowed argmin per document (numpy over Arrow batches)."""
    if k < 2 or window < 1:
        raise ValueError(f"need k >= 2 and window >= 1, got k={k} window={window}")
    id_t = docs.schema[id_col].dataType.simpleString()
    weights = _weights(k)
    kk, ww = k, window

    def gen(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for i, t in zip(pdf["id"], pdf["text"]):
                b = np.frombuffer((t or "").encode("utf-8", "ignore"),
                                  dtype=np.uint8).astype(np.int64)
                p, hp = _anchors_for_bytes(b, kk, ww, weights)
                if p.size == 0:
                    continue
                ids.append(np.full(p.size, i))
                poss.append(p)
                hs.append(hp)
            if ids:
                yield pd.DataFrame({"id": np.concatenate(ids),
                                    "pos": np.concatenate(poss).astype(np.int32),
                                    "h": np.concatenate(hs)})

    narrow = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return narrow.mapInPandas(gen, f"id {id_t}, pos int, h long")


def substring_dups(docs: DataFrame, min_len: int = 50, k: int = 16,
                   max_bucket: int = 64, id_col: str = "doc_id",
                   text_col: str = "text",
                   stats: dict | None = None,
                   other: DataFrame | None = None,
                   other_id_col: str | None = None,
                   other_text_col: str | None = None) -> DataFrame:
    """All maximal repeated byte spans of length >= ``min_len``:
    (a_id, b_id, a_start, b_start, length).

    Two modes sharing one kernel:

    * **self** (``other=None``): cross-doc spans within ``docs``,
      a_id < b_id — span-level dedup;
    * **bipartite** (``other`` given): spans between ``docs`` (a side) and
      ``other`` (b side), every colliding combination — span-level
      DECONTAMINATION (``other`` = the eval set), where n-gram collision
      counting is too blunt and the exact overlapping range is the needed
      evidence.

    Detection of every qualifying span is GUARANTEED by the winnowing bound
    (window is derived as ``min_len - k + 1``); emitted spans are verified
    byte ranges, never hash trust. ``stats`` (optional) records
    {'hot_buckets': n} — hashes whose join fanout (distinct a-ids ×
    distinct b-ids) would exceed ``max_bucket``² are dropped and counted (a
    dropped hash can only hide spans that OTHER anchors of the same span
    usually still catch; the guard trades exhaustiveness on heavy
    boilerplate for a hard fanout bound, same contract as the MinHash-LSH
    lane)."""
    if min_len < k + 1:
        raise ValueError(f"min_len must exceed k (got min_len={min_len}, k={k})")
    window = min_len - k + 1
    # eager localCheckpoint: the anchor table is read three times (hot-bucket
    # guard, a-side and b-side of the hash join) — without pinning, each read
    # re-runs the winnowing UDF over the full corpus. GC reclaims the
    # checkpoint RDD with the returned frame (repo-wide release pattern).
    anchors = winnow_anchor_table(docs, k=k, window=window,
                                  id_col=id_col, text_col=text_col
                                  ).localCheckpoint(eager=True)
    if other is None:
        anchors_b, texts_b_src = anchors, docs
        b_id_col, b_text_col = id_col, text_col
    else:
        b_id_col = other_id_col or id_col
        b_text_col = other_text_col or text_col
        anchors_b = winnow_anchor_table(other, k=k, window=window,
                                        id_col=b_id_col, text_col=b_text_col
                                        ).localCheckpoint(eager=True)
        texts_b_src = other

    na = anchors.groupBy("h").agg(F.count_distinct("id").alias("na"))
    if other is None:
        hot = na.where(F.col("na") > max_bucket).select("h")
    else:
        nb = anchors_b.groupBy("h").agg(F.count_distinct("id").alias("nb"))
        hot = (na.join(nb, "h")  # a hash absent on either side pairs nothing
               .where(F.col("na") * F.col("nb") > max_bucket * max_bucket)
               .select("h"))
    # eager localCheckpoint, not persist: the (tiny) hot-hash set is read
    # again by BOTH left_anti pruning joins at action time, AFTER this
    # function returns — a persist released here would recompute the
    # hot-bucket aggregate twice over the anchor table. GC reclaims the
    # checkpoint RDD with the returned frame (repo-wide release pattern).
    hot = hot.localCheckpoint(eager=True)
    hot_n = hot.count()
    if stats is not None:
        stats["hot_buckets"] = hot_n
    pruned_a = anchors.join(F.broadcast(hot), "h", "left_anti") if hot_n else anchors
    pruned_b = (anchors_b.join(F.broadcast(hot), "h", "left_anti")
                if hot_n else anchors_b)

    a = pruned_a.select(F.col("id").alias("a_id"), F.col("pos").alias("a_pos"), "h")
    b = pruned_b.select(F.col("id").alias("b_id"), F.col("pos").alias("b_pos"), "h")
    joined = a.join(b, "h")
    if other is None:
        joined = joined.where(F.col("a_id") < F.col("b_id"))
    cand = (joined.groupBy("a_id", "b_id")
            .agg(F.collect_list(F.struct("a_pos", "b_pos")).alias("anchors")))

    texts_a = docs.select(F.col(id_col).alias("a_id"),
                          F.col(text_col).alias("a_text"))
    texts_b = texts_b_src.select(F.col(b_id_col).alias("b_id"),
                                 F.col(b_text_col).alias("b_text"))
    paired = cand.join(texts_a, "a_id").join(texts_b, "b_id")

    id_t = docs.schema[id_col].dataType.simpleString()
    b_id_t = texts_b_src.schema[b_id_col].dataType.simpleString()
    out_schema = (f"a_id {id_t}, b_id {b_id_t}, "
                  "a_start int, b_start int, length int")
    kk, ml = k, min_len

    def extend(batches):
        for pdf in batches:
            o_a, o_b, o_sa, o_sb, o_len = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                A = (r.a_text or "").encode("utf-8", "ignore")
                Bt = (r.b_text or "").encode("utf-8", "ignore")
                pairs = sorted((int(x["a_pos"]), int(x["b_pos"]))
                               for x in r.anchors)
                covered: dict[int, tuple[int, int]] = {}  # diag -> (a_s, a_e)
                seen: set[tuple[int, int, int]] = set()
                for pa, pb in pairs:
                    d = pa - pb
                    cov = covered.get(d)
                    if cov and cov[0] <= pa < cov[1]:
                        continue
                    if A[pa:pa + kk] != Bt[pb:pb + kk]:
                        continue  # 31-bit hash collision — verified away
                    s = pa
                    while s > 0 and s - d > 0 and A[s - 1] == Bt[s - d - 1]:
                        s -= 1
                    e = pa + kk
                    while e < len(A) and e - d < len(Bt) and A[e] == Bt[e - d]:
                        e += 1
                    covered[d] = (s, e)
                    span = (s, s - d, e - s)
                    if e - s >= ml and span not in seen:
                        seen.add(span)
                        o_a.append(r.a_id)
                        o_b.append(r.b_id)
                        o_sa.append(span[0])
                        o_sb.append(span[1])
                        o_len.append(span[2])
            if o_a:
                yield pd.DataFrame({"a_id": o_a, "b_id": o_b, "a_start": o_sa,
                                    "b_start": o_sb, "length": o_len})

    return paired.mapInPandas(extend, out_schema)


def _merged_coverage(iv: list, total: int) -> float:
    """Union length of (start, length) intervals over a doc of `total`
    bytes, as a fraction — overlapping spans (different alignment diagonals
    can cover the same bytes) must not double-count."""
    if total <= 0 or not iv:
        return 0.0
    spans = sorted((int(s), int(s) + int(ln)) for s, ln in iv)
    cov, cs, ce = 0, *spans[0]
    for s, e in spans[1:]:
        if s > ce:
            cov += ce - cs
            cs, ce = s, e
        elif e > ce:
            ce = e
    cov += ce - cs
    return cov / total


def span_dedup_survivors(docs: DataFrame, min_len: int = 50, k: int = 16,
                         min_coverage: float = 0.5, max_bucket: int = 64,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_iter: int = 20, priority_col=None) -> DataFrame:
    """Span-coverage dedup policy (the policy layer over
    :func:`substring_dups`, public semantics per Lee et al.): two docs are
    duplicates when the MERGED repeated spans between them cover at least
    ``min_coverage`` of either doc's bytes; duplicate groups collapse
    transitively (``dup_clusters``) and one min-id representative survives
    per group. Shingle-Jaccard dedup misses this case: a short doc fully
    embedded in a long one has low Jaccard but 100% coverage of the short
    side.

    Scale shape: spans ride the bounded substring kernel; coverage is an
    interval merge per candidate PAIR (pandas over Arrow, O(spans log
    spans)); clustering and survivor thinning reuse the dedup lane
    (driver union-find under the small-graph threshold, O(log D) pointer
    jump above it). Returns the surviving rows of ``docs``."""
    from owl2jsonschema_js_spark.operators.dedup import dedup_survivors

    spans = substring_dups(docs, min_len=min_len, k=k, max_bucket=max_bucket,
                           id_col=id_col, text_col=text_col)
    lens = docs.select(F.col(id_col).alias("id"),
                       F.octet_length(text_col).alias("blen"))
    per_pair = (spans.groupBy("a_id", "b_id")
                .agg(F.collect_list(F.struct("a_start", "length")).alias("iv_a"),
                     F.collect_list(F.struct("b_start", "length")).alias("iv_b"))
                .join(lens.withColumnsRenamed({"id": "a_id", "blen": "a_len"}),
                      "a_id")
                .join(lens.withColumnsRenamed({"id": "b_id", "blen": "b_len"}),
                      "b_id"))

    id_t = docs.schema[id_col].dataType.simpleString()
    thr = float(min_coverage)

    def judge(batches):
        for pdf in batches:
            keep_a, keep_b = [], []
            for r in pdf.itertuples(index=False):
                cov_a = _merged_coverage(
                    [(x["a_start"], x["length"]) for x in r.iv_a], r.a_len)
                cov_b = _merged_coverage(
                    [(x["b_start"], x["length"]) for x in r.iv_b], r.b_len)
                if max(cov_a, cov_b) >= thr:
                    keep_a.append(r.a_id)
                    keep_b.append(r.b_id)
            if keep_a:
                yield pd.DataFrame({"a_id": keep_a, "b_id": keep_b})

    dup_pairs = per_pair.mapInPandas(judge, f"a_id {id_t}, b_id {id_t}")
    return dedup_survivors(docs, dup_pairs, id_col=id_col, max_iter=max_iter,
                           priority_col=priority_col)
