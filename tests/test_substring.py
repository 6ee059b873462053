"""Exact repeated-substring lane: winnowing-anchor detection guarantee,
maximal-span offsets, diagonal handling, hot-bucket guard — pinned against a
numpy brute-force diagonal-run oracle."""

import numpy as np
import pytest

from owl2jsonschema_js_spark.operators.substring import (substring_dups,
                                                         winnow_anchor_table)


def _rand_text(rng, n):
    return "".join(chr(c) for c in rng.integers(97, 123, size=n))


def _brute_spans(a: str, b: str, min_len: int):
    """All maximal shared byte spans >= min_len via diagonal run-length scan
    (O(n*m), fine at test sizes)."""
    A = np.frombuffer(a.encode(), dtype=np.uint8)
    B = np.frombuffer(b.encode(), dtype=np.uint8)
    out = set()
    for d in range(-(len(B) - 1), len(A)):
        ai0, bi0 = max(d, 0), max(-d, 0)
        n = min(len(A) - ai0, len(B) - bi0)
        if n < min_len:
            continue
        eq = A[ai0:ai0 + n] == B[bi0:bi0 + n]
        i = 0
        while i < n:
            if eq[i]:
                j = i
                while j < n and eq[j]:
                    j += 1
                if j - i >= min_len:
                    out.add((ai0 + i, bi0 + i, j - i))
                i = j
            else:
                i += 1
    return out


def _got_spans(spark, texts, min_len=50, k=16, **kw):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = substring_dups(df, min_len=min_len, k=k, **kw).collect()
    return {(r["a_id"], r["b_id"], r["a_start"], r["b_start"], r["length"])
            for r in rows}


def test_planted_span_exact_offsets(spark):
    rng = np.random.default_rng(7)
    shared = _rand_text(rng, 64)
    a = _rand_text(rng, 37) + shared + _rand_text(rng, 50)
    b = _rand_text(rng, 120) + shared + _rand_text(rng, 11)
    got = _got_spans(spark, [a, b], min_len=50)
    assert got == {(0, 1, 37, 120, 64)}


def test_alignment_sweep_guarantee(spark):
    """The winnowing bound is alignment-free: a >= min_len shared span must
    be found at EVERY offset shift, not just lucky tilings."""
    rng = np.random.default_rng(11)
    shared = _rand_text(rng, 55)
    b = _rand_text(rng, 80) + shared + _rand_text(rng, 80)
    for shift in range(8):
        a = _rand_text(rng, 30 + shift) + shared + _rand_text(rng, 40)
        got = _got_spans(spark, [a, b], min_len=50)
        # the planted region must be covered by some maximal span (random
        # flanks can coincidentally extend the match by a byte or two)
        assert any(aid == 0 and bid == 1
                   and sa <= 30 + shift and sb <= 80
                   and sa + ln >= 30 + shift + 55
                   for (aid, bid, sa, sb, ln) in got), (shift, got)


def test_two_spans_same_diagonal(spark):
    """Two distinct shared spans on the SAME alignment diagonal (equal
    offsets) must both be emitted — the diagonal memo skips only anchors
    inside an already-extended span, not the whole diagonal."""
    rng = np.random.default_rng(13)
    s1, s2 = _rand_text(rng, 60), _rand_text(rng, 60)
    gap_a, gap_b = _rand_text(rng, 25), _rand_text(rng, 25)
    a = "x" * 10 + s1 + gap_a + s2 + "y" * 10
    b = "z" * 10 + s1 + gap_b + s2 + "w" * 10
    got = _got_spans(spark, [a, b], min_len=50)
    assert (0, 1, 10, 10, 60) in got and (0, 1, 95, 95, 60) in got
    assert {(sa, sb, ln) for (_, _, sa, sb, ln) in got} == _brute_spans(a, b, 50)
    assert len(got) == 2


def test_matches_brute_force_on_mixed_corpus(spark):
    """End-to-end exactness: every pair's span set equals the O(n*m)
    diagonal-run oracle on a corpus mixing copies, partial overlaps and
    unrelated docs."""
    rng = np.random.default_rng(17)
    shared = _rand_text(rng, 90)
    texts = [
        _rand_text(rng, 40) + shared + _rand_text(rng, 40),        # 0
        shared[:70] + _rand_text(rng, 60),                         # 1 prefix
        _rand_text(rng, 150),                                      # 2 unrelated
        _rand_text(rng, 20) + shared + _rand_text(rng, 5),         # 3 full copy
    ]
    got = _got_spans(spark, texts, min_len=50)
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            for (sa, sb, ln) in _brute_spans(texts[i], texts[j], 50):
                want.add((i, j, sa, sb, ln))
    assert got == want and want  # non-degenerate: oracle found spans


def test_no_false_positives_and_short_spans_dropped(spark):
    rng = np.random.default_rng(23)
    shared49 = _rand_text(rng, 49)   # one byte below threshold
    a = _rand_text(rng, 60) + shared49 + _rand_text(rng, 60)
    b = _rand_text(rng, 33) + shared49 + _rand_text(rng, 90)
    assert _got_spans(spark, [a, b], min_len=50) == set()
    assert _got_spans(spark, [_rand_text(rng, 200), _rand_text(rng, 200)],
                      min_len=50) == set()


def test_hot_bucket_guard_counts_boilerplate(spark):
    rng = np.random.default_rng(29)
    boiler = _rand_text(rng, 80)
    texts = [boiler + _rand_text(rng, 30) for _ in range(12)]
    from owl2jsonschema_js_spark.operators.substring import substring_dups as sd
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    stats = {}
    rows = sd(df, min_len=50, k=16, max_bucket=4, stats=stats).collect()
    assert stats["hot_buckets"] > 0
    # guard bounds fanout; it may legitimately drop some boilerplate pairs
    assert len(rows) <= 12 * 11 / 2


def test_anchor_table_density_and_determinism(spark):
    rng = np.random.default_rng(31)
    df = spark.createDataFrame([(0, _rand_text(rng, 2000))],
                               "doc_id long, text string")
    t1 = sorted((r["pos"], r["h"]) for r in
                winnow_anchor_table(df, k=16, window=35).collect())
    t2 = sorted((r["pos"], r["h"]) for r in
                winnow_anchor_table(df, k=16, window=35).collect())
    assert t1 == t2 and t1
    # winnowing density ~ 2/(w+1); allow generous slack either side
    assert len(t1) <= 2000 * 4 / 35


def test_bipartite_span_decontamination(spark):
    """other= mode: spans between a corpus and an eval table, exact offsets,
    no corpus-internal pairs emitted."""
    rng = np.random.default_rng(37)
    leak = _rand_text(rng, 70)
    corpus = [
        _rand_text(rng, 50) + leak + _rand_text(rng, 30),   # 0: contaminated
        _rand_text(rng, 140),                               # 1: clean
        leak + _rand_text(rng, 90),                         # 2: contaminated at 0
    ]
    docs = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    evals = spark.createDataFrame(
        [(900, _rand_text(rng, 15) + leak + _rand_text(rng, 15))],
        "eval_id long, text string")
    rows = substring_dups(docs, min_len=60, k=16, other=evals,
                          other_id_col="eval_id").collect()
    got = {(r["a_id"], r["b_id"], r["a_start"], r["b_start"], r["length"])
           for r in rows}
    assert got == {(0, 900, 50, 15, 70), (2, 900, 0, 15, 70)}
    # corpus docs 0 and 2 share `leak` with EACH OTHER too — bipartite mode
    # must not emit that internal pair
    assert all(r["b_id"] == 900 for r in rows)


def test_span_dedup_survivors_coverage_policy(spark):
    """Coverage policy: a short doc embedded in a long one is a duplicate
    (low Jaccard, 100% coverage of the short side) and duplicate groups
    collapse transitively to the min-id representative; partial overlap
    below the threshold survives."""
    from owl2jsonschema_js_spark.operators.substring import span_dedup_survivors

    rng = np.random.default_rng(41)
    base = _rand_text(rng, 200)
    docs = [
        (0, base),                                          # representative
        (1, _rand_text(rng, 5) + base[40:160] + _rand_text(rng, 5)),  # embedded
        (2, base[30:150] + _rand_text(rng, 10)),            # embedded, other cut
        (3, base[:60] + _rand_text(rng, 140)),              # 30% overlap -> keep
        (4, _rand_text(rng, 180)),                          # unrelated -> keep
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    surv = span_dedup_survivors(df, min_len=50, k=16, min_coverage=0.5)
    assert sorted(r["doc_id"] for r in surv.collect()) == [0, 3, 4]
    # overlapping spans must not double-count coverage
    from owl2jsonschema_js_spark.operators.substring import _merged_coverage
    assert _merged_coverage([(0, 60), (30, 60), (200, 10)], 300) == 100 / 300
    assert _merged_coverage([], 100) == 0.0 and _merged_coverage([(0, 5)], 0) == 0.0


@pytest.mark.parametrize("seed", range(4))
def test_anchor_math_fuzz_vs_naive_reference(seed):
    """The vectorized anchor kernel == a character-at-a-time reference:
    rolling hash, first-min-per-window selection, dedup — over random byte
    strings including degenerate all-equal and length < k cases. Pure numpy,
    no Spark session."""
    from owl2jsonschema_js_spark.operators.substring import (_M, _anchors_for_bytes,
                                                             _weights)

    rng = np.random.default_rng(seed)
    k, w = int(rng.integers(2, 9)), int(rng.integers(1, 12))
    weights = _weights(k)
    cases = [
        rng.integers(0, 256, size=int(rng.integers(0, 400))),
        np.full(int(rng.integers(k, 60)), int(rng.integers(0, 256))),  # all equal
        rng.integers(97, 100, size=120),                               # tiny alphabet
        rng.integers(0, 256, size=k - 1),                              # too short
    ]
    for b in cases:
        b = b.astype(np.int64)
        got_p, got_h = _anchors_for_bytes(b, k, w, weights)
        # naive reference
        if b.size < k:
            assert got_p.size == 0
            continue
        hashes = []
        for i in range(b.size - k + 1):
            acc = 0
            for j in range(k):
                acc = (acc + int(b[i + j]) * int(weights[j])) % _M
            hashes.append(acc)
        if len(hashes) <= w:
            sel = {int(np.argmin(hashes))}
        else:
            sel = set()
            for s in range(len(hashes) - w + 1):
                win = hashes[s:s + w]
                sel.add(s + win.index(min(win)))
        assert list(got_p) == sorted(sel)
        assert [int(x) for x in got_h] == [hashes[p] for p in sorted(sel)]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_dups(df, min_len=10, k=16)
    with pytest.raises(ValueError):
        winnow_anchor_table(df, k=1, window=4)
