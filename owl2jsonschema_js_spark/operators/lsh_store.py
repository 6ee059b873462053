"""Stored-bucket LSH index: the on-disk production shape of incremental
near-dup detection.

:func:`~owl2jsonschema_js_spark.operators.dedup.minhash_lsh_pairs_incremental`
already never re-SHINGLES the stored corpus, but it still re-BANDS it: every
increment re-reads the index's signature arrays (n_hashes bigints per doc)
and recomputes band keys over old+new before the bucket join. At bench scale
that is noise; at 100 TB it is a full-corpus wide-column scan plus
8 xxhash64 per stored document *per daily increment* — work whose result
never changes between increments.

This module stores that work. An :class:`LshIndexStore` keeps two tables
under one root:

  ``features/``  (id, grams, sig)       — the minhash_features index
  ``buckets/``   (band_no, bucket, id)  — the precomputed band keys,
                                          partitioned by band_no

and each increment then touches the stored side only through

  * a (band_no, bucket, id) scan of ``buckets/`` — three int columns,
    ~``bands`` rows per doc, orders of magnitude narrower than the
    signature+grams table — for candidate generation and the bucket-size
    guard, and
  * an id-keyed join into ``features/`` for the exact-Jaccard verify —
    non-candidate rows fall out at the join (AQE's runtime bloom filter can
    push the candidate-id set into the scan), and the stored ``sig`` column
    is never read at all (plan-gated: ReadSchema pruning drops it, since
    banding only happens on the increment).

Semantics are IDENTICAL to ``minhash_lsh_pairs_incremental`` (asserted in
tests/test_lsh_store.py): pairs carry >=1 new side, a_id < b_id, bucket caps
count old+new together, and replayed/re-crawled ids are anti-joined out
before anything else. The two appends are not one atomic commit, so crash
windows are handled explicitly rather than wished away: an id counts as
indexed only when present in BOTH tables, and each append anti-joins its own
table — a replay of a fully-grown increment is a no-op, a replay of a
partially-grown one re-detects the increment and completes the missing
append (see :meth:`LshIndexStore.prepare`). At cluster scale both appends
become idempotent Iceberg MERGE / overwrite-by-key commits
(sources/tableio.py carries that lane).

Reference parity: same set-dedup semantics lane as operators/dedup.py
(reference lib/index.js:1041-1044 uniqueItems); the storage layout is ours —
the reference validates single documents and has no corpus index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.operators.dedup import (
    _banded, _verify_jaccard, minhash_features)


class LshIndexStore:
    """On-disk MinHash-LSH index with precomputed band buckets.

    Parameters mirror :func:`minhash_lsh_pairs` and are fixed per store —
    band keys are only comparable when (n_hashes, bands, shingle_k) match,
    so a store built with one geometry must be grown with the same one (the
    constructor args are the caller's contract; at cluster scale they would
    ride the table's properties)."""

    def __init__(self, spark: SparkSession, root: str, *,
                 n_hashes: int = 48, bands: int = 8, shingle_k: int = 5,
                 threshold: float = 0.7, max_bucket: int = 64,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert n_hashes % bands == 0
        self.spark = spark
        self.root = root.rstrip("/")
        self.features_path = f"{self.root}/features"
        self.buckets_path = f"{self.root}/buckets"
        self.n_hashes, self.bands = n_hashes, bands
        self.shingle_k, self.threshold = shingle_k, threshold
        self.max_bucket = max_bucket
        self.id_col, self.text_col = id_col, text_col

    # ------------------------------------------------------------ building
    def create(self, docs: DataFrame) -> None:
        """Seed the store from an initial corpus (no pairs are emitted —
        run the batch :func:`minhash_lsh_pairs` first if the seed corpus
        itself needs deduping, or just call :meth:`increment` on the empty
        store, which emits the seed's internal pairs exactly like the
        streaming monitor's batch 0).

        One-time bootstrap, not crash-atomic: a failure between the two
        writes leaves features rows without band rows (``mode('error')``
        then refuses a blind re-run). :meth:`doctor` detects and re-bands
        exactly those orphans; increments are replay-healed and never need
        it."""
        feat = minhash_features(docs, self.n_hashes, self.shingle_k,
                                self.id_col, self.text_col)
        feat.write.mode("error").parquet(self.features_path)
        # band from the WRITTEN table: one signature pass total, and the
        # band keys provably derive from the exact bytes future increments
        # will see
        stored = self.spark.read.parquet(self.features_path)
        (_banded(stored, self.n_hashes, self.bands)
         .write.mode("error").partitionBy("band_no").parquet(self.buckets_path))

    def features(self, id_type: str = "long") -> DataFrame:
        """Stored (id, grams, sig) rows; empty frame before the first
        create/increment (probed by READING, not a driver-local path check —
        the store lives wherever Spark's filesystem does: s3a/hdfs/file).
        ``id_type`` types the EMPTY frame's id column — internal callers
        pass the increment's actual id dtype so a first increment over
        string doc ids does not die on a string-vs-long union/least (the
        ids keep their source dtype end-to-end, as in minhash_features)."""
        from pyspark.errors import AnalysisException
        try:
            return self.spark.read.parquet(self.features_path)
        except AnalysisException:
            return self.spark.createDataFrame(
                [], f"id {id_type}, grams array<bigint>, sig array<bigint>")

    def buckets(self, id_type: str = "long") -> DataFrame:
        from pyspark.errors import AnalysisException
        try:
            return self.spark.read.parquet(self.buckets_path)
        except AnalysisException:
            return self.spark.createDataFrame(
                [], f"id {id_type}, band_no int, bucket long")

    # ----------------------------------------------------------- growing
    def _increment_plan(self, fresh: DataFrame) -> DataFrame:
        """Lazy pair plan for an (already anti-joined, materialized)
        increment — split out so the sig-never-read plan gate in
        tests/test_lsh_store.py can inspect exactly the plan
        :meth:`increment` executes."""
        idt = fresh.schema["id"].dataType.simpleString()
        new_banded = _banded(fresh, self.n_hashes, self.bands)
        old_banded = self.buckets(idt).select("band_no", "bucket", "id")

        # bucket-size guard over old+new TOGETHER (identical to the batch
        # lane: a boilerplate bucket that only crossed max_bucket via this
        # increment is still dropped) — counted on the narrow tables, no
        # signature bytes involved
        sizes = (old_banded.select("band_no", "bucket")
                 .unionByName(new_banded.select("band_no", "bucket"))
                 .groupBy("band_no", "bucket").agg(F.count(F.lit(1)).alias("bc")))
        keep = sizes.where(F.col("bc") <= self.max_bucket)

        new_k = (new_banded.join(keep.select("band_no", "bucket"),
                                 ["band_no", "bucket"]))
        old_k = (old_banded.join(keep.select("band_no", "bucket"),
                                 ["band_no", "bucket"]))

        # candidates: new-new (self-join within the increment) + new-old
        # (increment vs stored buckets). Old-old is structurally absent — the
        # stored side never joins itself. Ids normalized to a_id < b_id.
        nn = (new_k.alias("a").join(
                  new_k.alias("b"),
                  (F.col("a.band_no") == F.col("b.band_no"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col("a.id") < F.col("b.id")))
              .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id")))
        no = (new_k.alias("a").join(
                  old_k.alias("b"),
                  (F.col("a.band_no") == F.col("b.band_no"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  # a partially-grown store (crash between the two appends)
                  # can hold an increment id on the old side too — never
                  # pair an id with itself
                  & (F.col("a.id") != F.col("b.id")))
              .select(F.least("a.id", "b.id").alias("a_id"),
                      F.greatest("a.id", "b.id").alias("b_id")))
        cands = nn.unionByName(no).dropDuplicates(["a_id", "b_id"])

        # verify on candidates only; grams come from stored features (old
        # side) + the fresh frame (new side). Column pruning keeps the
        # stored scan at (id, grams) — `sig` never leaves parquet. The
        # stored side excludes fresh ids structurally: after a partial grow
        # the features table may already hold them, and a doubled grams row
        # would fan the verify join out into duplicate pair rows.
        grams = (self.features(idt).select("id", "grams")
                 .join(fresh.select("id"), "id", "left_anti")
                 .unionByName(fresh.select("id", "grams")))
        return _verify_jaccard(cands, grams, self.threshold)

    def prepare(self, new_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Materialized ``(pairs, fresh)`` for an increment WITHOUT growing
        the store — the two-phase form for callers that must commit the
        pairs to their own sink between detection and growth (the streaming
        monitor: pairs-append then grow gives at-least-once pair delivery
        under crash-replay; growing first would silently LOSE a replayed
        batch's pairs, since replayed ids are anti-joined out).

        Replay idempotency is keyed on BOTH tables: an id counts as indexed
        only when it has a features row AND its full set of ``bands`` band
        rows (a distinct-band count, not mere presence — a crash inside the
        buckets append's job commit can move SOME task files before dying,
        leaving an id with a partial band set; presence-keyed healing would
        call that id done and lose the missing bands' recall forever). A
        replay after a crash inside :meth:`grow` therefore re-detects the
        whole increment — re-emitting its pairs (at-least-once, dedup
        downstream on the caller's batch key) and letting grow's
        anti-joined appends heal exactly the absent rows. Keying on
        features alone would make that crash permanent: the replay would
        see "already indexed", append nothing, and every future increment
        would silently miss pairs against this one.

        A features-only store (non-empty ``features/``, empty ``buckets/``
        — the residue of a crashed :meth:`create`, which unlike increments
        is not replay-healed) raises instead of running: every stored-side
        candidate would be structurally absent, so an increment would
        silently emit zero pairs against the entire seed corpus.
        :meth:`doctor` repairs it.

        Both frames are eagerly localCheckpoint'ed: ``fresh`` because it
        feeds banding, verify and the eventual append; ``pairs`` because its
        plan lazily re-reads the store paths — evaluating it after
        :meth:`grow` would double the fresh rows into the grams join and the
        bucket-size guard. Candidate-bounded and increment-sized
        respectively, so both checkpoints are small by construction."""
        idt = new_docs.schema[self.id_col].dataType.simpleString()
        buckets = self.buckets(idt)
        if buckets.isEmpty() and not self.features(idt).isEmpty():
            raise RuntimeError(
                f"LSH store at {self.root!r} has features rows but no band "
                "rows (crashed create()?): increments would silently find "
                "zero pairs against the stored corpus. Run doctor() to "
                "re-band the stored signatures, then retry.")
        band_complete = (buckets.groupBy("id")
                         .agg(F.count_distinct("band_no").alias("nb"))
                         .where(F.col("nb") == self.bands).select("id"))
        fully_indexed = (self.features(idt).select("id")
                         .join(band_complete, "id", "left_semi"))
        fresh = (minhash_features(new_docs, self.n_hashes, self.shingle_k,
                                  self.id_col, self.text_col)
                 .join(fully_indexed, "id", "left_anti")
                 .localCheckpoint(eager=True))
        pairs = self._increment_plan(fresh).localCheckpoint(eager=True)
        return pairs, fresh

    def grow(self, fresh: DataFrame) -> None:
        """Append a :meth:`prepare`-returned increment to both tables.
        Each append is independently anti-joined against its own table, so
        replaying a partially-grown increment completes it instead of
        duplicating rows (features first; the write order means features ⊇
        buckets always holds, which :meth:`doctor` relies on). The bucket
        anti-join keys on (id, band_no), not id alone: a crash inside the
        buckets append's job commit can land SOME of an id's band rows
        (task files move sequentially), and id-keyed healing would declare
        that id done forever — every band it lost would silently stop
        generating candidates. Both missing-row frames are materialized
        BEFORE either write so neither append job reads the path it is
        appending to."""
        idt = fresh.schema["id"].dataType.simpleString()
        feat_missing = (fresh.join(self.features(idt).select("id"),
                                   "id", "left_anti")
                        .localCheckpoint(eager=True))
        bucket_missing = (_banded(fresh, self.n_hashes, self.bands)
                          .join(self.buckets(idt).select("id", "band_no"),
                                ["id", "band_no"], "left_anti")
                          .localCheckpoint(eager=True))
        feat_missing.write.mode("append").parquet(self.features_path)
        bucket_missing.write.mode("append").partitionBy("band_no") \
            .parquet(self.buckets_path)

    def doctor(self) -> int:
        """Repair path for ids whose band rows are missing or incomplete —
        the residue of a crash inside :meth:`create` (whose two writes are a
        one-time bootstrap, not replay-healed like increments) or inside a
        buckets append's job commit (which can land a PARTIAL band set for
        an id). Re-bands exactly the affected ids from their STORED
        signatures (the one code path that reads the stored ``sig`` column —
        it is the repair lane, not the increment hot path) and appends only
        the absent (id, band_no) rows. Returns the number of ids healed;
        0 means the store is consistent."""
        have = self.buckets().select("id", "band_no")
        complete = (have.groupBy("id")
                    .agg(F.count_distinct("band_no").alias("nb"))
                    .where(F.col("nb") == self.bands).select("id"))
        broken = (self.features()
                  .join(complete, "id", "left_anti")
                  .select("id", "sig").localCheckpoint(eager=True))
        # materialized before the write so the append job never reads the
        # path it is appending to
        missing = (_banded(broken, self.n_hashes, self.bands)
                   .join(have, ["id", "band_no"], "left_anti")
                   .localCheckpoint(eager=True))
        n = broken.count()
        if n:
            missing.write.mode("append").partitionBy("band_no") \
                .parquet(self.buckets_path)
        return n

    def increment(self, new_docs: DataFrame) -> DataFrame:
        """Dedup an increment against the store, grow the store, return the
        verified (a_id, b_id, jaccard) pairs (>=1 new side each).

        Stored-side cost per increment: one narrow ``buckets/`` scan + one
        id-keyed join into ``features/`` for candidate grams. The stored
        corpus is never re-shingled, never re-banded, and its signature
        column is never even read."""
        pairs, fresh = self.prepare(new_docs)
        self.grow(fresh)
        return pairs
