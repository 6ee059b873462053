"""Corpus-curation operators a training-data pipeline runs beside validation
before a corpus reaches a trainer:

 * eval-set decontamination — token n-gram overlap between a (small) held-out
   eval table and the (huge) training corpus,
 * PII detection + redaction — per-class regex counts and class-token
   replacement, all JVM ``regexp_count`` / ``regexp_replace``,
 * deterministic hash-based sampling — LCG-uniform per key, optionally
   stratified by a column, reproducible in ANSI SQL bit-for-bit,
 * mixture planning — per-source token budgets -> sampling rates.

Scale posture: the corpus side never shuffles. Decontamination broadcasts the
eval-set gram table (eval sets are thousands of prompts; the corpus is the
100 TB side) so the doc gram stream meets it in a BroadcastHashJoin and the
per-pair rollup is a partial-agg groupBy on (doc_id, eval_id) hit pairs — a
set many orders of magnitude smaller than the corpus. PII scan/redact and
hash sampling are row-local projections/filters (zero exchanges, plan-gated
in tests). The mixture planner's only aggregate is an O(n_sources) rollup
collected to a driver dict.

Reference scope: the reference (redaktor/owl2jsonschema.js) stops at schema
validation; these lanes extend SURVEY §2.3's pipeline mandate (dedup /
similarity / text-analysis) with the curation steps that sit beside
validation in a transcript pipeline. Semantics follow the public
deduplication/decontamination literature (n-gram collision checks) and
C4-style PII scrubbing — no reference code involved.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "ngrams_col",
    "distinct_ngrams_udf",
    "decontaminate",
    "PII_PATTERNS",
    "pii_scan",
    "pii_redact",
    "hash_sample",
    "hash_sample_exact_k",
    "mixture_rates",
]


# --------------------------------------------------------------------------
# token n-grams as a column expression (shared by decontamination)
# --------------------------------------------------------------------------

def ngrams_col(text_col: str = "text", n: int = 5) -> Column:
    """Array of space-joined token ``n``-grams of a text column — pure JVM
    expressions (split -> sequence -> transform/slice), no Python. Texts with
    fewer than ``n`` whitespace tokens yield an empty array (``sequence`` is
    guarded: its stop never drops below its start).

    NOTE: these nested array expressions are *interpreted* by Catalyst, not
    codegen'd — measured ~6.5s for the 50k-doc sf0.1 gram explode vs ~1.5s
    through :func:`distinct_ngrams_udf` (the same interpreted-vs-Arrow gap
    the MinHash signature lane measured). This stays as the dependency-free
    expression form; :func:`decontaminate` uses the Arrow builder."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from owl2jsonschema_js_spark.operators.dedup import ws_strip
    stripped = ws_strip(F.col(text_col))
    toks = F.split(stripped, r"\s+")
    # number of grams; sequence() needs start <= stop, so clamp at 0 and
    # filter the sentinel out for short texts. The extra blank guard closes
    # the n=1 phantom-gram hole (Spark's split('') yields [''], so blank
    # text would otherwise emit one EMPTY unigram — hypothesis-found;
    # distinct_ngrams_udf never had it).
    n_grams = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when((n_grams >= 1) & (F.length(stripped) > 0), grams) \
            .otherwise(F.array().cast("array<string>"))


def distinct_ngrams_udf(n: int = 5):
    """Arrow-batched twin of ``array_distinct(ngrams_col(...))`` — the hot
    path for corpus-side gram generation (the nested Catalyst expressions in
    :func:`ngrams_col` are interpreted, not codegen'd; this runs ~4× faster
    at sf0.1 and widens with text length). Tokenization is BIT-IDENTICAL to
    the expression form and the DuckDB oracles: ASCII-``\\s`` split after
    full-whitespace strip (``re.ASCII`` — python's default str.split() also
    splits on unicode spaces like NBSP, which Java/RE2 ``\\s`` does not, so
    a plain .split() here would silently fork the tokenization)."""
    import re

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("array<string>")
    def grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            toks = [x for x in ws.split(t) if x]
            if len(toks) < n:
                out.append([])
                continue
            out.append(list({" ".join(toks[i:i + n])
                             for i in range(len(toks) - n + 1)}))
        return pd.Series(out)

    return grams


# --------------------------------------------------------------------------
# eval-set decontamination
# --------------------------------------------------------------------------

def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str = "eval_id",
                  eval_text_col: str = "text",
                  min_shared: int = 1) -> DataFrame:
    """Training docs whose token ``n``-grams collide with a held-out eval
    set — the standard contamination check run before any corpus feeds a
    trainer (an eval prompt whose n-grams appear verbatim in training data
    poisons the benchmark).

    Returns one row per contaminated (doc, eval item) pair::

        (doc_id, eval_id, n_shared bigint, eval_frac double)

    where ``n_shared`` counts DISTINCT shared n-grams and ``eval_frac`` is
    the fraction of the eval item's distinct n-grams found in that doc
    (1.0 == the doc contains every gram of the prompt).

    Scale shape: the eval gram table (id, gram, per-id gram count) is
    broadcast — eval sets are small by construction; the corpus side streams
    through one scan + explode into a BroadcastHashJoin, then aggregates only
    the HIT pairs. No corpus-wide shuffle, no corpus self-join. Gram
    generation rides the Arrow builder (:func:`distinct_ngrams_udf`) on both
    sides — tokenization identical to the expression form and the oracles,
    ~4× cheaper on the corpus side than the interpreted Catalyst transform.
    """
    grams_udf = distinct_ngrams_udf(n)
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams_udf(F.col(text_col))).alias("gram"))

    eval_grams = eval_docs.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(grams_udf(F.col(eval_text_col))).alias("gram"))
    # per-eval-item distinct gram count, carried on the broadcast side so the
    # fraction needs no second join
    eval_sized = eval_grams.withColumn(
        "n_eval_grams", F.count("*").over(Window.partitionBy("eval_id")))

    hits = doc_grams.join(F.broadcast(eval_sized), "gram")
    out = (hits.groupBy("doc_id", "eval_id")
           .agg(F.count("*").alias("n_shared"),
                F.first("n_eval_grams").alias("n_eval_grams"))
           .where(F.col("n_shared") >= min_shared)
           .select("doc_id", "eval_id", "n_shared",
                   (F.col("n_shared") / F.col("n_eval_grams")).alias("eval_frac")))
    return out


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

# RE2-compatible (no lookaround/backrefs) so the same pattern runs in Spark
# (java.util.regex) and DuckDB (RE2) — oracle parity is tested. Counting is
# per-class and independent; a token matching two classes counts in both
# (documented). Redaction order below resolves replacement overlap
# deterministically: a class runs BEFORE any class that can partially
# consume its matches (partial consumption breaks the later match and
# leaks its remainder) — see the per-entry notes.
#
# SCOPE: this dict is a demo POLICY, not a compliance catalog — real
# deployments pass their own ``patterns=`` (the operators are
# policy-agnostic; any RE2-safe dict works and inherits the same oracle
# parity). The built-ins cover the common US shapes (SSN, NANP phone,
# 16-digit cards) plus the international classes a transcript corpus most
# often leaks: IBAN account numbers (ISO 13616 shape: country code + check
# digits + 11-30 alnum BBAN), E.164 international phone numbers
# (+country-code, 8-15 digits total), and full-form IPv6 addresses.
# Formats with no regular structure (national IDs, passports — largely
# arbitrary per-country digit runs) are explicitly out of scope for a
# pattern policy and belong to an NER pass.
PII_PATTERNS: dict[str, str] = {
    # credit_card before email: card matches are the only ones that can
    # contain a SPACE, which email's local-part class lacks — on
    # 'pay 4111 1111 1111 1111@corp.com' an email-first pass matches only
    # '1111@corp.com' and leaks the other 12 PAN digits. Running the card
    # first redacts the full PAN; the residue '[CREDIT_CARD]@corp.com' at
    # worst leaks a domain, never digits (and a dash-separated card inside
    # a real address redacts as the card too — '[' stops the email match —
    # trading an [EMAIL] label for the stronger PAN guarantee).
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    # email before the digit-run classes: its local part admits '+digits',
    # dots, and dashes, so phone_e164 / ssn / ipv4 can all match INSIDE an
    # address (e.g. the plus-addressed 'john+20260818@gmail.com'); redacting
    # a sub-span first would break the email match and leak the remainder.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "iban": r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "phone_e164": r"\+[1-9]\d{7,14}\b",
    "ipv6": r"\b[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){7}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             patterns: dict[str, str] | None = None) -> DataFrame:
    """Per-doc PII hit counts, one scan, all JVM ``regexp_count``::

        (doc_id, pii_email, pii_ipv4, ..., pii_total)

    Row-local projection — zero exchanges (plan-gated). ``pii_total`` sums
    the per-class counts, so cross-class overlaps count once per class."""
    pats = patterns or PII_PATTERNS
    if not pats:
        raise ValueError("pii_scan needs at least one pattern")
    counts = {k: F.regexp_count(F.col(text_col), F.lit(p)) for k, p in pats.items()}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col),
        *[v.alias(f"pii_{k}") for k, v in counts.items()],
        total.alias("pii_total"))


def pii_redact(docs: DataFrame, text_col: str = "text",
               patterns: dict[str, str] | None = None,
               token: str = "[{cls}]") -> DataFrame:
    """Replace every PII match with a class token (``[EMAIL]`` by default),
    preserving all other columns. Replacement order is the dict's iteration
    order — the default runs each class before any class that could
    partially consume its matches: credit card first (the one class whose
    matches contain spaces, which email can bite the '1111@host' tail off,
    leaking 12 PAN digits), then email before phone_e164/ssn/ipv4 (all of
    which can match inside an address's local part or host, e.g.
    plus-addressed 'a+123456789@x.com'), and card before phone, so a
    16-digit card never leaks a phone-shaped tail. Row-local, zero
    exchanges."""
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    for cls, p in pats.items():
        col = F.regexp_replace(col, p, token.format(cls=cls.upper()))
    return docs.withColumn(text_col, col)


# --------------------------------------------------------------------------
# deterministic sampling + mixture planning
# --------------------------------------------------------------------------

_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2_147_483_648  # glibc LCG, mod 2^31


_SALT_MIX = 2_654_435_761  # Knuth multiplicative-hash constant

_INTEGRAL_KEY_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _lcg_key(key: Column, dtype: str, caller: str) -> Column:
    """Reduce a key column to a canonical bigint in [0, 2^31) for the LCG,
    validating the dtype UP FRONT — the guard that closes the silent
    wrong-answer trap where a non-numeric id cast to bigint NULLs, making
    ``u < rate`` never true (empty sample / all-train split, no error).

    * integral keys — ``pmod(key, 2^31)``: pmod, not ``%``, because Spark's
      ``%`` keeps the dividend's sign, and a NEGATIVE id would otherwise
      yield u < 0 and be kept at ANY rate (even 0.0);
    * string keys — :func:`~owl2jsonschema_js_spark.operators.dedup.poly_fold`
      (31-bit polynomial char fold, base 131 mod 2^31-1): still plain
      arithmetic, so an external SQL oracle reproduces the sampled SET
      bit-for-bit (the DuckDB twin is in poly_fold's docstring) — the
      property ``xxhash64`` lacks;
    * anything else (double, timestamp, …) raises ValueError.

    NULL keys stay NULL: the sampling predicate is then NULL and the row
    DROPS on every side that tests it — callers sampling on a nullable key
    should filter or coalesce first (documented on the public entry points).
    """
    base = dtype.lower()
    if base in _INTEGRAL_KEY_TYPES:
        return F.pmod(key.cast("bigint"), F.lit(_LCG_M))
    if base == "string":
        from owl2jsonschema_js_spark.operators.dedup import poly_fold
        return poly_fold(key)  # already < 2^31 - 1
    raise ValueError(
        f"{caller}: key column has type {dtype!r}; deterministic LCG "
        "sampling/splitting needs an integral or string key (a silent cast "
        "would NULL the key and drop or misroute every row). Cast or hash "
        "the key to bigint/string explicitly first.")


def _lcg_uniform(key_reduced: Column, salt: int) -> Column:
    """Deterministic uniform in [0, 1) from a :func:`_lcg_key`-reduced key —
    two multiplies + pmods in bigint space (inputs already in [0, 2^31) so no
    product can overflow int64). The salt folds in MULTIPLICATIVELY
    (``key + (salt*Knuth mod 2^31)`` before the LCG) — an additive post-LCG
    salt would only shift the uniform by ``salt/2^31`` and leave the sampled
    set ~unchanged. Identical arithmetic is expressible in ANSI SQL, so
    sampled row SETS (not just rates) are oracle-checkable; salt=0 keeps the
    plain ``(key*A + C) % 2^31`` form."""
    k = F.pmod(key_reduced + F.lit((salt * _SALT_MIX) % _LCG_M), F.lit(_LCG_M))
    return F.pmod(k * _LCG_A + _LCG_C, F.lit(_LCG_M)) / F.lit(float(_LCG_M))


def hash_sample(docs: DataFrame, rate: float | dict[str, float],
                key_col: str = "doc_id", stratum_col: str | None = None,
                salt: int = 0) -> DataFrame:
    """Deterministic hash sample: keep a row iff ``lcg(key, salt) < rate``.

    * ``rate`` a float — uniform sampling;
    * ``rate`` a dict + ``stratum_col`` — per-stratum rates (unlisted strata
      drop, the usual mixture-plan semantics).

    Unlike ``df.sample()`` this is reproducible across runs, partitionings
    and engines (the LCG is plain bigint arithmetic), is row-local (zero
    exchanges), and the SAME key always resolves the same way — re-running a
    grown corpus re-selects the old rows, so incremental pipelines don't
    churn their sample. Different ``salt`` values draw independent samples
    (held-out splits).

    Keys may be integral (negatives fold via pmod) or string (31-bit
    polynomial char hash — still SQL-reproducible, see
    :func:`~owl2jsonschema_js_spark.operators.dedup.poly_fold` for the DuckDB
    twin); any other key dtype raises up front rather than silently NULLing.
    Rows whose key is NULL always drop (the predicate is NULL) — filter or
    coalesce nullable keys first."""
    dtype = docs.schema[key_col].dataType.simpleString()
    u = _lcg_uniform(_lcg_key(F.col(key_col), dtype, "hash_sample"), salt)
    if isinstance(rate, dict):
        if stratum_col is None:
            raise ValueError("per-stratum rates need stratum_col")
        if not rate:
            raise ValueError("empty rate dict: no stratum would ever be kept")
        r: Column = F.lit(-1.0)  # unlisted strata never sampled
        expr = None
        for k, v in rate.items():
            if not (0.0 <= v <= 1.0):
                raise ValueError(f"rate for {k!r} out of [0,1]: {v}")
            cond = F.col(stratum_col) == k
            expr = F.when(cond, F.lit(float(v))) if expr is None else expr.when(cond, F.lit(float(v)))
        r = expr.otherwise(r)
    else:
        if not (0.0 <= rate <= 1.0):
            raise ValueError(f"rate out of [0,1]: {rate}")
        r = F.lit(float(rate))
    return docs.where(u < r)


def hash_sample_exact_k(docs: DataFrame, k: int,
                        key_col: str = "doc_id",
                        stratum_col: str | None = None,
                        salt: int = 0, slack: float = 6.0) -> DataFrame:
    """EXACTLY ``k`` rows (per stratum, if ``stratum_col`` is given), chosen
    deterministically: the k rows whose LCG value is smallest, ties broken by
    key — the count-based sibling of :func:`hash_sample` for mixture plans
    scheduled in documents rather than rates ("exactly 100k docs per
    source"). Same key contract (integral via pmod / string via the
    SQL-reproducible polynomial fold; other dtypes raise; NULL keys drop),
    same ``salt`` = independent draws. Strata holding fewer than k rows keep
    everything.

    NOT incremental-stable, by construction: the k-th-smallest threshold
    moves when the corpus grows, so re-running over a grown corpus may swap
    members. Pipelines needing re-run stability use the rate lane
    (:func:`hash_sample`), whose verdict is per-key.

    Scale shape — no full-table rank: a global/per-stratum ``row_number``
    funnels each stratum through ONE reducer (a 100 TB stratum = one-task
    sort). Instead:

      1. one O(strata) aggregate gets per-stratum row counts (driver dict),
      2. a ROW-LOCAL filter keeps u < (k + slack*sqrt(k) + 10)/n — expected
         candidates k + slack·√k, so P(shortfall) ≈ exp(-slack²/2) (~1e-8
         at the default 6),
      3. the exact rank runs on the small candidate set only,
      4. a second O(strata) count VERIFIES no stratum fell short; any that
         did (adversarial u clustering, never observed) re-enters at rate
         1.0 — correctness never rests on the probabilistic bound.

    Deterministic for fixed inputs at every step (the fallback is decided by
    exact counts, not sampling). The selected SET has an ANSI-SQL twin
    (QUALIFY row_number() OVER (... ORDER BY lcg, key) <= k) — parity-tested
    in tests/test_curation.py."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dtype = docs.schema[key_col].dataType.simpleString()
    u = _lcg_uniform(_lcg_key(F.col(key_col), dtype, "hash_sample_exact_k"),
                     salt)
    strat = (F.col(stratum_col) if stratum_col
             else F.lit("__all")).alias("__strat")
    base = docs.withColumn("__u", u).withColumn("__strat", strat)
    totals = {r["__strat"]: r["n"] for r in
              base.groupBy("__strat").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    want = k + slack * (k ** 0.5) + 10

    def rate_for(counts: dict[str, float]) -> Column:
        expr = None
        for s, n in counts.items():
            r = 1.0 if n <= want else want / n
            cond = F.col("__strat").eqNullSafe(F.lit(s))
            expr = (F.when(cond, F.lit(r)) if expr is None
                    else expr.when(cond, F.lit(r)))
        return expr.otherwise(F.lit(1.0)) if expr is not None else F.lit(1.0)

    cand = base.where(F.col("__u") < rate_for(totals))
    have = {r["__strat"]: r["n"] for r in
            cand.groupBy("__strat").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    short = [s for s, n in totals.items()
             if have.get(s, 0) < min(k, n)]
    if short:  # exact-count fallback — never rests on the tail bound
        cond = None
        for s in short:
            c = F.col("__strat").eqNullSafe(F.lit(s))
            cond = c if cond is None else (cond | c)
        cand = base.where(cond).unionByName(
            cand.where(~cond if cond is not None else F.lit(True)))
    w = Window.partitionBy("__strat").orderBy("__u", key_col)
    return (cand.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .drop("__u", "__strat", "__rk"))


def pack_shards(docs: DataFrame, budget_tokens: int,
                id_col: str = "doc_id",
                token_count_col: Column | None = None,
                n_parts: int | None = None) -> DataFrame:
    """Assign every doc a training-shard id by EXACT global token cumsum in
    ``id_col`` order: ``shard_id = tokens_before_this_doc // budget_tokens``
    — the deterministic doc→shard layout a trainer's data loader needs
    (greedy sequential fill; a shard overshoots its budget by at most one
    document, never undershoots out of order).

    A naive Spark spelling — ``sum().over(Window.orderBy(id))`` with no
    partition key — funnels the whole table through ONE reducer. This is the
    scale-correct two-pass shape instead:

      1. the narrow (id, tokens) projection is range-partitioned on id and
         sorted within partitions (one shuffle of two columns, never the
         corpus),
      2. per-partition token sums roll up to the driver (O(n_partitions)
         rows), a prefix scan turns them into per-partition global offsets,
      3. one Arrow pass re-walks each partition carrying (offset + running
         sum) across batches — same cross-batch-carry discipline as the
         turn-gap window in ``order.py``.

    Range-partition boundaries are sample-based and may vary run to run, but
    the assignment is boundary-invariant: offsets are computed from the
    actual sums of the actual partitions in range order, so only the global
    order matters — ``id_col`` must therefore be unique (it is a key).
    Returns (id, n_tokens, shard_id); join back on id if shard routing
    should ride the full rows."""
    from owl2jsonschema_js_spark.operators.textstats import token_count

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    tc = token_count_col if token_count_col is not None else token_count()
    narrow = docs.select(F.col(id_col).alias("id"),
                         tc.cast("bigint").alias("n_tokens"))
    n_parts = n_parts or narrow.sparkSession.sparkContext.defaultParallelism
    # eager localCheckpoint FREEZES the (sample-based) range boundaries: the
    # offsets job and the assignment pass below are separate actions, and an
    # unpinned lineage would re-sample — offsets computed on one partitioning
    # must not be applied to another. GC reclaims the checkpoint RDD with the
    # returned frame (the repo-wide release pattern for internal frames).
    ranged = (narrow.repartitionByRange(n_parts, "id")
              .sortWithinPartitions("id")
              .withColumn("part", F.spark_partition_id())
              .localCheckpoint(eager=True))
    part_sums = {r["part"]: r["s"] for r in
                 ranged.groupBy("part").agg(F.sum("n_tokens").alias("s")).collect()}
    offsets, acc = {}, 0
    for p in sorted(part_sums):
        offsets[p] = acc
        acc += part_sums[p]

    budget = int(budget_tokens)
    out_schema = ("id " + ranged.schema["id"].dataType.simpleString()
                  + ", n_tokens bigint, shard_id bigint")

    def assign(batches):
        run = None  # tokens before the current row, carried across batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["part"].iloc[0])]
            cum_before = run + pdf["n_tokens"].cumsum() - pdf["n_tokens"]
            run += int(pdf["n_tokens"].sum())
            yield pd.DataFrame({"id": pdf["id"],
                                "n_tokens": pdf["n_tokens"],
                                "shard_id": cum_before // budget})

    return ranged.mapInPandas(assign, out_schema)


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       test_frac: float = 0.1, id_col: str = "doc_id",
                       salt: int = 0) -> DataFrame:
    """Train/test split that CANNOT leak near-duplicates across the split:
    duplicate clusters (transitive closure over ``pairs``, the output of any
    dedup pair lane) are assigned as UNITS — the split key is the cluster's
    representative id, so two docs connected by any chain of near-dup pairs
    always land on the same side. Splitting by doc id instead is the classic
    eval-inflation trap: a paraphrase of a training doc in the test set
    scores as generalization.

    Deterministic (same LCG as :func:`hash_sample` — ``salt`` draws
    independent splits) and incremental-stable: a re-run over a grown corpus
    keeps every old doc's side unless new pairs merge its cluster (in which
    case the MERGED cluster re-keys as one unit — sides may flip together,
    never apart). Clustering inherits the dedup lane's driver/distributed
    threshold. Returns ``docs`` + a ``split`` column ('train' | 'test');
    unpaired docs key on their own id.

    Ids may be integral (negatives fold via pmod) or string (SQL-reproducible
    polynomial hash, as in :func:`hash_sample`); other id dtypes raise up
    front — a silent bigint cast would NULL every key and route the whole
    corpus to 'train', the exact leak this split exists to prevent. NULL ids
    route to 'train' (the test predicate is NULL) — validate ids upstream."""
    from owl2jsonschema_js_spark.operators.dedup import dup_clusters

    if not (0.0 <= test_frac <= 1.0):
        raise ValueError(f"test_frac out of [0,1]: {test_frac}")
    id_dtype = docs.schema[id_col].dataType.simpleString()
    # fail fast on an unusable id dtype BEFORE paying for clustering; the
    # result is discarded — _lcg_key is the single source of truth for
    # which dtypes the LCG lanes accept
    _lcg_key(F.col(id_col), id_dtype, "leakage_safe_split")
    members = dup_clusters(pairs)
    assign = (members.select(F.col("id").alias(id_col),
                             F.col("cluster_id").alias("_ck"))
              .localCheckpoint(eager=True))
    members.unpersist()
    key = F.coalesce(F.col("_ck"), F.col(id_col))
    u = _lcg_uniform(_lcg_key(key, id_dtype, "leakage_safe_split"), salt)
    split = F.when(u < F.lit(float(test_frac)),
                   F.lit("test")).otherwise(F.lit("train"))
    return (docs.join(assign, id_col, "left")
            .withColumn("split", split).drop("_ck"))


def mixture_rates(docs: DataFrame, weights: dict[str, float],
                  budget_tokens: int, stratum_col: str = "source",
                  token_count_col: Column | None = None) -> dict[str, float]:
    """Turn a target mixture (per-source weights summing to ~1) and a total
    token budget into per-source sampling rates for :func:`hash_sample`:
    ``rate_s = min(1, weight_s * budget / tokens_s)``.

    One O(n_sources) aggregate; the collected dict is driver state the size
    of the source list, never the data. Sources absent from ``weights`` get
    no rate (dropped by ``hash_sample``); a source whose budget share exceeds
    its actual tokens caps at 1.0 (callers wanting oversampling handle
    repetition upstream — deterministic sampling cannot mint new rows)."""
    from owl2jsonschema_js_spark.operators.textstats import token_count

    tc = token_count_col if token_count_col is not None else token_count()
    totals = {r["s"]: r["t"] for r in
              docs.groupBy(F.col(stratum_col).alias("s"))
                  .agg(F.sum(tc).alias("t")).collect()}
    out: dict[str, float] = {}
    for s, w in weights.items():
        toks = totals.get(s, 0)
        out[s] = 1.0 if toks == 0 else min(1.0, (w * budget_tokens) / toks)
    return out
