"""Dedup / similarity / textstats / multimodal operator tests on the driver
corpora (read-only parquet) + hand-built fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dups(spark):
    from owl2jsonschema_js_spark.operators.dedup import exact_dups

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c"), (4, "a b")], "doc_id long, text string")
    got = {r["text"]: r["n_dups"] for r in exact_dups(df).collect()}
    assert got == {"a b": 3}


def test_ngram_jaccard_exact_vs_python(spark, docs):
    """Inverted-index jaccard == brute-force python set jaccard, exactly."""
    from owl2jsonschema_js_spark.operators.dedup import ngram_jaccard_pairs

    sample = docs.limit(60)
    got = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in ngram_jaccard_pairs(sample, n=2, threshold=0.2).collect()}

    rows = sample.select("doc_id", "text").collect()
    def bigrams(t):
        w = t.split()
        return set(" ".join(w[i:i + 2]) for i in range(len(w) - 1))
    exp = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ga, gb = bigrams(a["text"]), bigrams(b["text"])
            if not ga or not gb:
                continue
            jac = len(ga & gb) / len(ga | gb)
            if jac >= 0.2:
                key = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                exp[key] = jac
    assert got.keys() == exp.keys()
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9


def test_minhash_lsh_finds_near_dups(spark):
    from owl2jsonschema_js_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(0, base), (1, base + " ok"),             # near-dup pair
            (2, "completely different words entirely unrelated content here"),
            (3, base)]                                 # exact dup of 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a_id"], r["b_id"]) for r in
             minhash_lsh_pairs(df, threshold=0.6).collect()}
    assert (0, 3) in pairs and (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_simhash_near_dups(spark):
    from owl2jsonschema_js_spark.operators.dedup import simhash_pairs

    base = ("spark table scan join filter group sort merge window agg hash row "
            "column batch stream data key value order part line fast slow")
    rows = [(0, base), (1, base.replace("slow", "rapid")),
            (2, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in simhash_pairs(df, max_hamming=16).collect()}
    assert (0, 1) in got
    assert not any(2 in k for k in got)


def test_topk_neighbors_matches_numpy(spark, emb):
    from owl2jsonschema_js_spark.operators.similarity import topk_neighbors

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    got = [(r["vec_id"], r["score"]) for r in
           topk_neighbors(emb, q.tolist(), k=5, exclude_id=0).collect()]
    scores = sorted(((vid, float(v @ q)) for vid, v in vecs.items() if vid != 0),
                    key=lambda x: (-x[1], x[0]))[:5]
    assert [g[0] for g in got] == [s[0] for s in scores]
    for g, s in zip(got, scores):
        assert abs(g[1] - s[1]) < 1e-6


def test_rhp_lsh_recall_vs_bruteforce(spark, emb):
    from owl2jsonschema_js_spark.operators.similarity import pairs_above, rhp_lsh_pairs

    brute = {(r["a_id"], r["b_id"]) for r in pairs_above(emb, 0.8).collect()}
    lsh = {(r["a_id"], r["b_id"]) for r in
           rhp_lsh_pairs(emb, threshold=0.8, n_planes=32, bands=8).collect()}
    # every LSH pair is exact-verified -> subset; recall on high-sim pairs decent
    assert lsh <= brute
    if brute:
        assert len(lsh) / len(brute) >= 0.5


def test_quality_and_tokens(spark):
    from owl2jsonschema_js_spark.operators.textstats import quality_scores, token_count

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat!"), (2, ""), (3, "x x x x"),
         (4, "\nfoo bar baz\t"), (5, "\t\n  ")],
        "doc_id long, text string")
    tc = {r["doc_id"]: r["tc"] for r in df.select("doc_id", token_count().alias("tc")).collect()}
    # 4/5: tab/newline padding strips fully — no off-by-one empty token
    assert tc == {1: 6, 2: 0, 3: 4, 4: 3, 5: 0}
    q = {r["doc_id"]: r for r in quality_scores(df.where("doc_id=1")).collect()}
    assert q[1]["n_tokens"] == 6
    assert abs(q[1]["distinct_ratio"] - 5 / 6) < 1e-9
    # distinct tokens: {the, cat, sat, on, mat!}; profile stopword hit: 'the'
    # ('mat!' keeps punctuation — whitespace tokenization)
    assert abs(q[1]["stopword_ratio"] - 1 / 5) < 1e-9
    assert abs(q[1]["punct_ratio"] - 1 / 23) < 1e-9


def test_lang_id_deterministic(spark):
    from owl2jsonschema_js_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [(1, "the cat and the dog of it"), (2, "der hund und die katze ist ein"),
         (3, "zz qq pp")],  # no overlap anywhere -> tie -> first lang asc = 'de'
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "de"


def test_winnow_fingerprints(spark):
    from owl2jsonschema_js_spark.operators.textstats import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop"), (3, "zzzzzzzzzzzzzzzz"), (4, "ab")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["fingerprints"] for r in winnow_fingerprints(df).collect()}
    assert got[1] == got[2] and got[1] != got[3]
    assert got[4] == []  # shorter than k
    assert all(isinstance(x, int) for x in got[1])


def test_multimodal_plumbing(spark):
    from owl2jsonschema_js_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, n=32)
    feats = extract_features(media, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        assert r["kind"] in ("image", "audio", "video")
    # determinism
    again = {r["media_id"]: r["feature"] for r in extract_features(media, 16).collect()}
    assert again[rows[0]["media_id"]] == rows[0]["feature"]
    # the non-stub path now REALLY decodes (BMP/WAV/RVID codecs,
    # tests/test_media_codecs.py) — on this stub table's fake payloads it
    # must fail header validation loudly, not fabricate features
    import pytest as _pt
    with _pt.raises(Exception, match="not a BMP|not a RIFF|not an RVID"):
        extract_features(media, decode_stub=False).collect()


def test_dedup_similarity_degenerate_inputs(spark):
    """Null/empty/short texts and zero vectors must not crash (ANSI div-by-0)
    or produce spurious pairs."""
    from owl2jsonschema_js_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from owl2jsonschema_js_spark.operators.similarity import pairs_above, rhp_lsh_pairs

    rows = [(0, ""), (1, "abc"), (2, None), (3, "abcd"),
            (4, "hello world hello world"), (5, "hello world hello world")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert {(r["a_id"], r["b_id"]) for r in
            minhash_lsh_pairs(df, threshold=0.5).collect()} == {(4, 5)}
    assert {(r["a_id"], r["b_id"]) for r in
            simhash_pairs(df).collect()} == {(4, 5)}

    edf = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8), (2, [1.0] * 8)],
        "vec_id long, embedding array<float>")
    assert {(r["a_id"], r["b_id"]) for r in
            pairs_above(edf, 0.5).collect()} == {(1, 2)}
    assert {(r["a_id"], r["b_id"]) for r in
            rhp_lsh_pairs(edf, threshold=0.5, dim=8).collect()} == {(1, 2)}


def test_multimodal_frame_sampling(spark):
    """1->N frame explosion: video rows yield ceil(n_frames/every_n) frames
    with deterministic payloads; non-video rows yield none."""
    from owl2jsonschema_js_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n=48)
    metas = {r["media_id"]: (r["kind"], r["meta"]["n_frames"])
             for r in media.select("media_id", "kind", "meta").collect()}
    frames = sample_frames(media, every_n=10).collect()
    got = {}
    for r in frames:
        got.setdefault(r["media_id"], []).append(r["frame_no"])
        assert len(r["frame_payload"]) == 12  # 8-byte head + 4-byte frame_no
    for mid, (kind, n_frames) in metas.items():
        exp = list(range(0, n_frames, 10)) if kind == "video" else []
        assert sorted(got.get(mid, [])) == exp, (mid, kind, n_frames)
    # deterministic across runs
    again = sorted((r["media_id"], r["frame_no"]) for r in
                   sample_frames(media, every_n=10).collect())
    assert again == sorted((r["media_id"], r["frame_no"]) for r in frames)


def test_dup_clusters_transitive_components(spark):
    """a~b, b~c, 9~3 must collapse into one component labeled by its min id
    even though (a,c) etc. were never emitted as pairs."""
    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6), (9, 3)],
                                  "a_id long, b_id long")
    # default path (driver union-find at this size) and the forced
    # distributed loop must agree exactly
    out = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
    stats = {}
    dist = {r["id"]: r["cluster_id"]
            for r in dup_clusters(pairs, small_graph_max=0, stats=stats).collect()}
    assert dist == out and stats["mode"] == "distributed"


def test_dedup_survivors_one_per_cluster_plus_singletons(spark):
    from owl2jsonschema_js_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  "a_id long, b_id long")
    surv = sorted(r["doc_id"] for r in dedup_survivors(docs, pairs).collect())
    assert surv == [0, 1, 4, 5, 7]


def test_dup_clusters_long_chain_converges_via_pointer_jumping(spark):
    """A 40-node path graph needs 39 plain propagation rounds (past
    max_iter=20); the pointer-jump step must collapse it in O(log D) rounds,
    with localCheckpoint truncating the iterative lineage along the way."""
    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(39)],
                                  "a_id long, b_id long")
    stats = {}
    # small_graph_max=0 forces the distributed loop — this test protects the
    # O(log D) round bound, which the driver fast path would bypass
    res = dup_clusters(pairs, max_iter=20, stats=stats, small_graph_max=0)
    out = res.collect()
    res.unpersist()
    assert len(out) == 40
    assert all(r["cluster_id"] == 0 for r in out)
    # O(log D) contract: ~2*log2(40)+slack, nowhere near the plain-propagation
    # bound of 39 rounds
    assert stats["rounds"] <= 12, stats


def test_dup_clusters_driver_path_equals_loop_on_mixed_graph(spark):
    """Driver union-find == forced distributed loop, exactly, on a graph
    mixing chains, stars, singleton pairs and a merge edge (deterministic
    LCG edge set); also exercises string ids through the fast path."""
    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    edges = [(i, i + 1) for i in range(0, 30)]                # chain
    edges += [(100, 100 + j) for j in range(1, 8)]            # star
    edges += [(200, 201), (300, 301)]                         # islands
    edges += [(30, 100)]                                      # chain~star merge
    edges += [((i * 48271) % 97 + 400, (i * 16807) % 89 + 400)
              for i in range(40)]                             # pseudo-random
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    fast = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    stats = {}
    slow = {r["id"]: r["cluster_id"]
            for r in dup_clusters(pairs, small_graph_max=0, max_iter=30,
                                  stats=stats).collect()}
    assert stats["mode"] == "distributed"
    assert fast == slow
    # chain and star collapsed into one component labeled by the chain min
    assert fast[107] == 0 and fast[30] == 0

    s_pairs = spark.createDataFrame([("b", "c"), ("a", "b"), ("x", "y")],
                                    "a_id string, b_id string")
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(s_pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_dup_clusters_adversarial_chain_round_count(spark):
    """Adversarial diameter: a 300-node near-dup chain (boilerplate text
    linking long chains is the corpus-scale worst case). Plain min-label
    propagation needs 299 rounds; the stale-parent pointer jump must stay
    within the O(log D) budget — this assertion protects the claim against
    regressions that would silently turn the loop linear."""
    import math

    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    d = 300
    pairs = spark.createDataFrame([(i, i + 1) for i in range(d - 1)],
                                  "a_id long, b_id long")
    stats = {}
    res = dup_clusters(pairs, max_iter=25, stats=stats, small_graph_max=0)
    out = res.collect()
    res.unpersist()
    assert len(out) == d and all(r["cluster_id"] == 0 for r in out)
    assert stats["rounds"] <= 2 * math.ceil(math.log2(d)) + 2, stats


def test_dedup_survivors_releases_cluster_cache(spark):
    """ADVICE r2: dedup_survivors used to leak the persisted cluster table
    (the documented 'call .unpersist()' contract was impossible for callers).
    Now the loser-id set is checkpointed and everything else is released
    before return — at most one small persisted RDD (the checkpoint) remains."""
    from owl2jsonschema_js_spark.operators.dedup import dedup_survivors

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(10)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  "a_id long, b_id long")
    surv = dedup_survivors(docs, pairs)
    assert sorted(r["doc_id"] for r in surv.collect()) == [0, 1, 4, 5, 7, 8, 9]
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_quality_filter_rules_and_attribution(spark):
    """Gopher/C4-style quality filter: per-rule flags, keep verdict, and
    first-failed attribution, verified on hand-built docs with one known
    failure mode each."""
    from owl2jsonschema_js_spark.operators.textstats import quality_filter

    # varied vocabulary (repeating one sentence x10 fails the distinct-ratio
    # rule — correctly: that IS the repetition guard firing)
    good = " ".join(f"the item{i} holds value{i} and" for i in range(20))
    rows = [
        (0, good),                                   # passes everything
        (1, "short doc"),                            # tokens (too few)
        (2, ("spam " * 600).strip()),                # distinct_ratio too low
        (3, ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 6).strip()),  # no stopwords
        (4, "the, and; of! is? " * 30),              # punct_ratio too high
        (5, "\n".join(["the data of the run is fine today"] * 20)),  # dup lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert out[0]["keep"] and out[0]["first_failed"] is None
    assert not out[1]["keep"] and out[1]["first_failed"] == "tokens"
    assert not out[2]["keep"] and not out[2]["ok_distinct"]
    assert not out[3]["keep"] and not out[3]["ok_stopword"]
    assert not out[4]["keep"] and not out[4]["ok_punct"]
    assert not out[5]["keep"] and not out[5]["ok_repeated_line"]
    # attribution order: first_failed is the FIRST rule in rule order
    assert out[2]["first_failed"] in ("tokens", "distinct")
    # survivors filterable in the obvious way
    assert [r["doc_id"] for r in quality_filter(df).where("keep").collect()] == [0]


def test_quality_filter_single_scan_no_join(spark):
    """The filter chain must stay one codegen scan — dup_line_ratio rides the
    corpus_profile select; a join here would shuffle the whole corpus."""
    from owl2jsonschema_js_spark.operators.textstats import quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan[:500]


def test_semantic_dedup_survivors_deterministic(spark):
    """Identical vectors (cosine exactly 1.0) share sign signatures, so LSH
    provably pairs them in every band; orthogonal vectors score 0.0 and fail
    the exact-cosine verification even when buckets collide. Survivors keep
    the min id of the duplicate group plus every non-duplicate row."""
    from owl2jsonschema_js_spark.operators.dedup import semantic_dedup_survivors

    e = lambda i: [1.0 if j == i else 0.0 for j in range(8)]
    rows = [(1, e(0)), (2, e(0)), (3, e(0)), (4, e(1)), (5, e(2))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    surv = semantic_dedup_survivors(emb, threshold=0.9, dim=8)
    assert sorted(r["vec_id"] for r in surv.collect()) == [1, 4, 5]


def test_semantic_dedup_survivors_matches_exact_cosine_oracle(spark):
    """Round-5: the COMPOSED lane (RHP-LSH pairs -> connected components ->
    survivor anti-join) graded end-to-end against a DuckDB exact-cosine +
    recursive-CTE-closure oracle on a planted corpus. Planted duplicates are
    positive scalings (cosine exactly 1.0 -> identical sign bits -> LSH
    collision in EVERY band), and the oracle itself asserts the qualifying
    pair set is exactly the planted one — so this is an exact equality, not
    a recall test. Chain {0,100,101} + pair {5,200} must collapse to their
    min ids through transitive closure."""
    import duckdb
    import pandas as pd

    from owl2jsonschema_js_spark.operators.dedup import semantic_dedup_survivors

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows += [(100, (2.0 * base[0]).tolist()), (101, (0.5 * base[0]).tolist()),
             (200, (3.0 * base[5]).tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    surv = semantic_dedup_survivors(emb, threshold=0.9, dim=16)
    got = sorted(r["vec_id"] for r in surv.collect())

    con = duckdb.connect()
    con.register("emb", pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}))
    # the construction's precondition: exact-cosine >= 0.9 pairs are exactly
    # the planted mirrors (no organic near-pair at this seed)
    pairs = con.execute("""
        SELECT a.vec_id, b.vec_id FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        ORDER BY 1, 2
    """).fetchall()
    assert pairs == [(0, 100), (0, 101), (5, 200), (100, 101)]
    want = [r[0] for r in con.execute("""
        WITH RECURSIVE p AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id
          FROM emb a JOIN emb b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9),
        e AS (SELECT a_id AS s, b_id AS t FROM p UNION SELECT b_id, a_id FROM p),
        reach(id, lbl) AS (
          SELECT s, s FROM e
          UNION
          SELECT e.s, r.lbl FROM e JOIN reach r ON e.t = r.id),
        comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        SELECT vec_id FROM emb
        WHERE vec_id NOT IN (SELECT id FROM comp WHERE id != cluster_id)
        ORDER BY vec_id
    """).fetchall()]
    assert got == want
    assert set(got) & {100, 101, 200} == set() and {0, 5} <= set(got)


def test_rhp_lsh_pairs_leaves_no_session_cache(spark, emb):
    """rhp_lsh_pairs' internal signature/vector frames must be GC-released
    localCheckpoints, not session-lifetime persists — semantic_dedup_survivors
    calls it once per corpus pass and a long-lived session would otherwise
    accumulate a cached copy of the embedding table per call (the defect
    class the round-4 incremental-dedup kernel fix removed)."""
    from owl2jsonschema_js_spark.operators.similarity import rhp_lsh_pairs

    spark.catalog.clearCache()
    assert rhp_lsh_pairs(emb, threshold=0.8).count() >= 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), \
        "rhp_lsh_pairs registered a DataFrame persist with no release handle"
