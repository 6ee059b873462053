"""ValidationRunner — executes a RulePlan over a transcripts DataFrame.

Produces the reference semantics of its emitted schemas at table scale
(BASELINE.json:6): exact per-partition pass/fail verdicts, violation rows, and
per-rule counts.

Execution shape (SURVEY.md §3.4):

  row rules    -> ONE projection: every ok_<rule> Column in a single select,
                  fused by Catalyst into one WholeStageCodegen scan; violations
                  extracted in the same scan via array_compact+explode (no
                  per-rule re-scan).
  cardinality  -> groupBy(group_key).count() — partial (map-side) aggregation
                  makes this immune to hot-conversation skew.
  contiguity   -> min/max/count per group (NO global window needed: given key
                  uniqueness, turn_idx is contiguous iff min==0 and max==n-1).
  uniqueness   -> groupBy on the FULL key (conv_id, turn_idx), shuffling only
                  key columns: hashing the full key spreads a hot conv_id
                  across partitions (turn_idx acts as the salt) — the
                  salted-repartition strategy the north rule mandates, realized
                  with Catalyst operators at key width instead of row width.
                  With group rules present (default 'auto'), the pass is GATED:
                  the conversation agg's count != countDistinct flag bounds it
                  to conversations that actually contain duplicates, so clean
                  data pays no table-wide key shuffle at all.
  referential  -> broadcast left_anti join vs the (small) catalog (C19).

All heavy paths are pure DataFrame ops — zero Python in the row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import RowRule, RulePlan

DEFAULT_PART_COL = "part"
VIOLATION_COLUMNS = ("part", "rule_id", "conv_id", "turn_idx", "observed", "schema_id")

# referential fold threshold: catalogs up to this many distinct keys become a
# literal IN-set predicate in the row scan (Catalyst optimizes to a hash-set
# InSet); larger catalogs fall back to the broadcast left_anti join. The fold
# removes an entire extra pass over the fact table — measured 5.7s -> 4.1s on
# the 8M-turn flagship.
REF_FOLD_MAX = 10_000

# full-vs-gated uniqueness crossover for uniqueness='auto' with a measured
# skew profile: below this row count the full-key shuffle is cheaper than the
# gate's extra grouped persist (measured: 14.0s full vs 19.6s gated at 80M
# turns on local[32], where the whole shuffle rides the page cache); far above
# it the full-key shuffle is network+disk bytes proportional to the table
# (~24 TB at 10^12 rows, SCALE.md) while the gate's cost stays one conv-width
# aggregate. 200M ≈ 2.5x the largest scale where 'full' was measured to win.
AUTO_GATED_MIN_ROWS = 200_000_000


def _safe(rule_id: str) -> str:
    return "ok__" + rule_id.replace(".", "_").replace("$", "doc")


@dataclass
class ValidationResult:
    """Lazy handles over the run's outputs; nothing is collected until asked."""

    # input + ok__<rule> boolean columns + ok_all; when the catalog is small
    # enough to fold (REF_FOLD_MAX), ok__table_referential rides here too —
    # referential is row-local once the catalog key set is a predicate
    checked: DataFrame
    violations: DataFrame       # (part, rule_id, conv_id, turn_idx, observed, schema_id)
    verdicts: DataFrame         # (part, n_rows, rule_id, n_violations) long-form
    rule_ids: list[str] = field(default_factory=list)
    # C20/C21 provenance: schema metadata (id/title/version/translations/links)
    # normalized here and in the checkpoint manifest — violation rows carry
    # only the schema_id key (denormalizing translations onto 10^12 rows
    # would be the wrong trade at scale).
    spec_meta: dict = field(default_factory=dict)
    _cached: list[DataFrame] = field(default_factory=list)

    def unpersist(self) -> None:
        """Release intermediates persisted by the run (the gated-uniqueness
        grouped aggregate). Call after the outputs are materialized —
        long-lived sessions (streaming foreachBatch, repeated bench loops)
        otherwise accumulate cached plans."""
        for df in self._cached:
            df.unpersist()
        self._cached.clear()

    def verdict_summary(self) -> DataFrame:
        """(part, n_rows, n_violations, pass) — the per-partition verdict."""
        return (
            self.verdicts.groupBy("part", "n_rows")
            .agg(F.sum("n_violations").alias("n_violations"))
            .withColumn("pass", F.col("n_violations") == 0)
        )

    def collect_verdicts(self) -> dict:
        """{part: {"n_rows": n, "pass": bool, "rules": {rule_id: n_violations}}}
        — canonical (sort_keys) structure for manifests and goldens."""
        out: dict = {}
        for r in self.verdicts.collect():
            p = out.setdefault(str(r["part"]), {"n_rows": r["n_rows"], "rules": {}})
            if r["n_violations"]:
                p["rules"][r["rule_id"]] = r["n_violations"]
        for p in out.values():
            p["pass"] = not p["rules"]
        return out


class ValidationRunner:
    def __init__(
        self,
        plan: RulePlan,
        part_col: str = DEFAULT_PART_COL,
        key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
        n_parts: int = 16,
        uniqueness: str = "full",
        skew_profile: dict | None = None,
        cache_ref_catalog: bool = True,
    ):
        """``uniqueness``: 'full' (default) always runs the full-key groupBy;
        'gated' restricts it to conversations the (already-paid) group agg
        flags as containing duplicates (count != countDistinct); 'auto' =
        gated when the group agg runs on the same key, else full. Outputs are
        identical across strategies (proven in tests/test_runner_e2e.py).

        ``skew_profile`` (a stored :func:`~owl2jsonschema_js_spark.skew.
        key_skew_profile` of the conversation key) makes 'auto' a MEASURED
        decision instead of a structural one: gated is chosen only when the
        profile's observed row count clears ``AUTO_GATED_MIN_ROWS`` — the
        documented crossover where the gate's extra conv-width pass starts
        paying for the table-wide key shuffle it deletes. The profile's
        ``max_share`` deliberately does NOT flip this choice: both lanes are
        hot-conversation-safe by construction (the full-key groupBy spreads a
        hot conv_id by turn_idx; the gate's conv aggregate partial-aggregates
        before the conv-width reduce), so conversation skew is handled by key
        shape here, not by strategy selection. The strategy actually executed
        is recorded on ``self.last_uniqueness`` by :meth:`run`.

        Which to use is a scale question, measured both ways: at single-box
        bench scale the page-cached 80M-key shuffle costs less than the gate's
        extra key scan + grouped persist (14.0s full vs 19.6s gated at 80M
        turns), so 'full' is the default; at 10^12 rows the full-key shuffle
        is ~24 TB through network+disk while the gate's flagged set is
        normally tiny, so a cluster deployment should pass 'gated'
        (SCALE.md).

        ``cache_ref_catalog``: memoize the referential fold's collected key
        set per (catalog DataFrame object, key) across :meth:`run` calls —
        right for bench loops and frozen dims, where it deletes a catalog
        scan per run. A DataFrame is a plan, not data, so when the SAME
        object is backed by a mutating catalog table (spark.table('dim') in
        a long foreachBatch loop with dim rows landing between batches) the
        memo would serve stale keys; such callers pass False to re-collect
        per run, or simply hand a fresh DataFrame per batch."""
        if uniqueness not in ("auto", "full", "gated"):
            raise ValueError(f"unknown uniqueness strategy {uniqueness!r}")
        # uniqueness always evaluates over key_cols (the violation-row shape
        # is keyed on them) — a spec declaring uniqueItems on any OTHER column
        # set would be silently validated against the wrong key, so mismatches
        # fail loudly here instead (align key_cols= with the spec's key)
        uk = tuple(plan.table.unique_keys or ())
        if uk and set(uk) != set(key_cols):
            raise ValueError(
                f"spec declares uniqueItems on {uk!r} but the runner's "
                f"key_cols are {tuple(key_cols)!r}; uniqueness is evaluated "
                "over key_cols — pass key_cols matching the declared key "
                "(silently checking a different key would be a wrong answer)")
        self.plan = plan
        self.part_col = part_col
        self.key_cols = key_cols
        self.n_parts = n_parts
        self.uniqueness = uniqueness
        self.skew_profile = skew_profile
        self.cache_ref_catalog = cache_ref_catalog
        self.last_uniqueness: str | None = None

    # ------------------------------------------------------------------ rows
    def _with_partition(self, df: DataFrame) -> DataFrame:
        """Derive the partition column when the storage layer didn't provide one
        (Iceberg tables carry a partition spec; plain parquet fixtures get a
        deterministic bucket of the conversation id)."""
        if self.part_col in df.columns:
            return df
        return df.withColumn(
            self.part_col,
            F.pmod(F.xxhash64(F.col(self.key_cols[0])), F.lit(self.n_parts)).cast("int"),
        )

    def _row_checked(self, df: DataFrame, rules=None) -> DataFrame:
        rules = self.plan.row_rules if rules is None else rules
        cols = {_safe(r.rule_id): r.ok for r in rules}
        checked = df.withColumns(cols)
        ok_all = F.lit(True)
        for name in cols:
            ok_all = ok_all & F.col(name)
        return checked.withColumn("ok_all", ok_all)

    def _row_violations(self, checked: DataFrame, rules=None) -> DataFrame:
        """One scan: per-row array of failing-rule structs, nulls compacted,
        exploded. Catalyst evaluates every ok column once (they're already in
        `checked`)."""
        rules = self.plan.row_rules if rules is None else rules
        k0, k1 = self.key_cols
        if not rules:
            return checked.sparkSession.createDataFrame(
                [], f"part string, rule_id string, {k0} string, {k1} int, observed string")
        entries = F.array(*[
            F.when(
                ~F.col(_safe(r.rule_id)),
                F.struct(F.lit(r.rule_id).alias("rule_id"), r.observed.alias("observed")),
            )
            for r in rules
        ])
        return (
            checked
            .where(~F.col("ok_all"))
            .select(
                F.col(self.part_col).cast("string").alias("part"),
                F.col(k0), F.col(k1),
                F.explode(F.array_compact(entries)).alias("v"),
            )
            .select("part", F.col("v.rule_id").alias("rule_id"), k0, k1,
                    F.col("v.observed").alias("observed"))
        )

    # ----------------------------------------------------------------- table
    def _uniqueness_violations(self, df: DataFrame) -> DataFrame:
        """C12 at table scope: duplicate (conv_id, turn_idx).

        groupBy on the FULL key, shuffling ONLY (key, part): hash-partitioning
        by (conv_id, turn_idx) spreads a hot conversation across tasks
        (turn_idx is the built-in salt), and the shuffle is key-width instead
        of row-width — a count-window over the key would shuttle the text
        column (the bulk of the bytes) through the exchange for nothing.
        Violation rows (one per duplicate row, matching injected==detected
        accounting) are reconstituted with explode(sequence(1, cnt)) — no
        join back to the wide table."""
        return self._uniqueness_from_keyed(self._keyed_counts(df))

    def _keyed_counts(self, df: DataFrame) -> DataFrame:
        """ONE key-width groupBy: per-(conv_id, turn_idx) row counts. This is
        the uniqueness shuffle — and in full mode the conversation aggregate
        CASCADES off it (a second, conv-width rollup of the already-distinct
        keys) instead of paying its own countDistinct-expanded shuffle over
        the fact table. Shuffles only (key, part), never row width."""
        k0, k1 = self.key_cols
        return (
            df.select(k0, k1, self.part_col)
            .groupBy(k0, k1)
            # min, not first: a duplicate key straddling STORAGE partitions
            # (date-partitioned tables; conv-hash parts can't straddle) must
            # attribute to the same part on every run — first() is
            # evaluation-order-dependent and would flip verdict attribution
            # between runs on such layouts
            .agg(F.count(F.lit(1)).alias("__kcnt"),
                 F.min(self.part_col).alias(self.part_col))
        )

    def _uniqueness_from_keyed(self, keyed: DataFrame) -> DataFrame:
        k0, k1 = self.key_cols
        dups = keyed.where(F.col("__kcnt") > 1)
        return (
            dups.select(
                F.col(self.part_col).cast("string").alias("part"),
                F.lit("table.unique").alias("rule_id"),
                F.col(k0), F.col(k1),
                F.col("__kcnt").cast("string").alias("observed"),
                F.explode(F.sequence(F.lit(1), F.col("__kcnt"))).alias("__i"),
            )
            .drop("__i")
        )

    def _grouped(self, df: DataFrame) -> DataFrame:
        """The fused conversation-level aggregate (ONE shuffle) shared by
        cardinality, contiguity AND the gated-uniqueness flag: count,
        countDistinct(turn_idx), min, max per group. Persisted because two
        downstream consumers read it (group violations + dup gate); it is one
        row per conversation — O(convs), never O(rows)."""
        t = self.plan.table
        k1 = self.key_cols[1]
        gk = t.group_key or t.contiguous or self.key_cols[0]
        return df.groupBy(gk).agg(
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct(F.col(k1)).alias("__nd"),
            F.min(k1).alias("__mn"),
            F.max(k1).alias("__mx"),
            # min for run-to-run deterministic attribution (see _keyed_counts)
            F.min(self.part_col).alias(self.part_col),
        )

    def _grouped_from_keyed(self, keyed: DataFrame) -> DataFrame:
        """The same conversation aggregate as :meth:`_grouped`, derived from
        the uniqueness key counts: rows of `keyed` are distinct (conv, turn)
        keys, so count(turn) == countDistinct(turn) over the original table
        (SQL count/countDistinct both skip NULLs; the NULL-turn group's rows
        still reach __n via sum(__kcnt), matching count(*)). Exact same
        values, no second fact-table shuffle and no distinct expansion."""
        k0, k1 = self.key_cols
        return keyed.groupBy(F.col(k0)).agg(
            F.sum("__kcnt").alias("__n"),
            F.count(F.col(k1)).alias("__nd"),
            F.min(k1).alias("__mn"),
            F.max(k1).alias("__mx"),
            # min for run-to-run deterministic attribution (see _keyed_counts)
            F.min(self.part_col).alias(self.part_col),
        )

    def _uniqueness_violations_gated(self, df: DataFrame, grouped: DataFrame) -> DataFrame:
        """C12 via the dup gate: only conversations where count != countDistinct
        can contain duplicate (conv_id, turn_idx) rows, and the group agg
        already computed both. The full-key groupBy then runs on that (normally
        tiny) subset — on clean data the table-wide key shuffle disappears
        entirely. AQE picks a broadcast join when the flagged set is small and
        falls back to a shuffled join when it is not, so the worst case
        degrades to the full strategy's cost, never past it."""
        t = self.plan.table
        k0, _ = self.key_cols
        gk = t.group_key or t.contiguous or k0
        flagged = (grouped.where(F.col("__n") != F.col("__nd"))
                   .select(F.col(gk).alias("__gk")))
        # null-SAFE join: a NULL conv_id group with duplicate turn_idx IS
        # flagged by the agg (count != countDistinct groups NULLs together),
        # but an equality join would drop it (NULL == NULL is false in SQL),
        # silently diverging from the full strategy's groupBy semantics
        sub = (df.select(*self.key_cols, self.part_col)
               .join(flagged, F.col(k0).eqNullSafe(F.col("__gk")))
               .drop("__gk"))
        return self._uniqueness_violations(sub)

    def _group_violations(self, df: DataFrame, grouped: DataFrame | None = None) -> DataFrame:
        """C5/C6 cardinality + turn_idx contiguity, fused into ONE groupBy over
        the conversation key (same grouping => one shuffle, one pass).

        Cardinality: count() bounds — map-side partial agg, hot-key safe.
        Contiguity, window-free: turn_idx is the contiguous set {0..max} iff
        min==0 ∧ max==n_distinct-1 (duplicates are table.unique's concern).
        count_distinct also partial-aggregates."""
        t = self.plan.table
        k0, k1 = self.key_cols
        gk = t.group_key or t.contiguous or k0
        want_card = t.min_items is not None or t.max_items is not None
        want_contig = bool(t.contiguous)
        if grouped is None:
            grouped = self._grouped(df)
        card_bad = F.lit(False)
        if t.min_items is not None:
            card_bad = card_bad | (F.col("__n") < t.min_items)
        if t.max_items is not None:
            card_bad = card_bad | (F.col("__n") > t.max_items)
        contig_bad = (F.col("__mn") != 0) | (F.col("__mx") != F.col("__nd") - 1)

        checks = []
        if want_card:
            checks.append(F.when(card_bad, F.struct(
                F.lit("table.cardinality").alias("rule_id"),
                F.col("__n").cast("string").alias("observed"))))
        if want_contig:
            checks.append(F.when(contig_bad, F.struct(
                F.lit("table.contiguity").alias("rule_id"),
                F.concat_ws(":", "__mn", "__mx", "__nd").alias("observed"))))
        return grouped.select(
            F.col(self.part_col).cast("string").alias("part"),
            F.col(gk).alias(k0),
            F.lit(None).cast("int").alias(k1),
            F.explode(F.array_compact(F.array(*checks))).alias("v"),
        ).select("part", F.col("v.rule_id").alias("rule_id"), k0, k1,
                 F.col("v.observed").alias("observed"))

    def _referential_violations(self, df: DataFrame, catalog: DataFrame | None) -> DataFrame:
        """C19: tool reference must resolve in the catalog — broadcast
        left_anti join (violations are the anti side)."""
        t = self.plan.table
        ref = t.referential
        assert ref is not None
        if catalog is None:
            raise ValueError("referential constraint declared but no catalog DataFrame given")
        col, key = ref["column"], ref.get("key", ref["column"])
        k0, k1 = self.key_cols
        cat = F.broadcast(catalog.select(F.col(key).alias(col)).distinct())
        return (
            df.where(F.col(col).isNotNull())
            .join(cat, on=col, how="left_anti")
            .select(
                F.col(self.part_col).cast("string").alias("part"),
                F.lit("table.referential").alias("rule_id"),
                F.col(k0), F.col(k1),
                F.col(col).cast("string").alias("observed"),
            )
        )

    # ------------------------------------------------------------------- run
    def run(self, df: DataFrame, catalog: DataFrame | None = None) -> ValidationResult:
        """Pass structure (each line = one scan/shuffle over the data):

          1. row rules + per-partition row-rule fail counts: ONE scan
             (groupBy(part) with count + sum(fail) per rule — the violation
             rows themselves are a separate lazy DataFrame, only computed if
             the caller materializes them for the sink).
          2. cardinality + contiguity: ONE fused groupBy(conv).
          3. uniqueness: window over the full key (hash repartition + sort).
          4. referential: broadcast left_anti.

        Verdict counts never recount exploded violation rows — they aggregate
        booleans in the same scans that evaluate the rules.

        Eager-scan caveat (the ONE exception to ValidationResult's lazy
        contract): when the plan declares a referential constraint, run()
        launches one bounded Spark job at plan-build time — the catalog's
        distinct keys, LIMIT ``REF_FOLD_MAX + 1`` — to decide fold-vs-anti-
        join. The collected key set is memoized per catalog DataFrame object,
        so repeated run() calls with the same catalog (bench loops, streaming
        foreachBatch) pay the scan once."""
        t = self.plan.table
        df = self._with_partition(df)

        # referential FOLD: the catalog is a dimension table; when its key set
        # fits a literal IN-set, the check becomes one more predicate in the
        # row scan — deleting an entire extra pass over the fact table. Big
        # catalogs fall back to the broadcast left_anti join. Verdict and
        # violation shapes are identical either way (rule_id stays
        # 'table.referential'; null refs pass, matching the anti-join's
        # isNotNull pre-filter).
        row_rules = list(self.plan.row_rules)
        ref_folded = False
        if t.referential:
            ref = t.referential
            if catalog is None:
                raise ValueError(
                    "referential constraint declared but no catalog DataFrame given")
            col = ref["column"]
            key = ref.get("key", col)
            cached = getattr(self, "_ref_fold_cache", None)
            if (self.cache_ref_catalog and cached is not None
                    and cached[0] is catalog and cached[1] == key):
                vals = cached[2]
            else:
                vals = [r[0] for r in catalog.select(F.col(key)).distinct()
                        .limit(REF_FOLD_MAX + 1).collect()]
                # memoized per catalog OBJECT (held strongly, so id-reuse
                # can't alias a different frame). NB a DataFrame object is
                # a PLAN, not data: spark.table('dim') re-resolves per
                # action, so a mutating catalog table behind one long-lived
                # object would serve stale keys from this memo — such
                # callers pass cache_ref_catalog=False (or a fresh
                # DataFrame per run, which misses naturally)
                self._ref_fold_cache = (catalog, key, vals)
            if len(vals) <= REF_FOLD_MAX:
                c = F.col(col)
                ok = c.isNull() if not vals else (c.isNull() | c.isin(vals))
                row_rules.append(RowRule(
                    rule_id="table.referential", key=col,
                    ok=F.coalesce(ok, F.lit(False)),
                    observed=F.coalesce(c.cast("string"), F.lit("null"))))
                ref_folded = True

        checked = self._row_checked(df, row_rules)

        want_group = (t.min_items is not None or t.max_items is not None
                      or bool(t.contiguous))
        gk_card = t.group_key or self.key_cols[0]
        gk_contig = t.contiguous or self.key_cols[0]
        if want_group and t.contiguous and t.group_key and t.group_key != t.contiguous:
            raise ValueError("cardinality 'per' key and contiguity key must match "
                             f"(got {t.group_key!r} vs {t.contiguous!r})")

        gk = t.group_key or t.contiguous or self.key_cols[0]
        gate_ok = want_group and gk == self.key_cols[0]
        if self.uniqueness == "auto" and self.skew_profile is not None:
            # measured decision: the gate pays only past the documented
            # crossover row count (see AUTO_GATED_MIN_ROWS / __init__ doc)
            use_gated = (gate_ok and
                         self.skew_profile["n_rows"] >= AUTO_GATED_MIN_ROWS)
        else:
            use_gated = (self.uniqueness == "gated"
                         or (self.uniqueness == "auto" and gate_ok))
        # gated needs the conversation aggregate to gate on: when
        # uniqueness='gated' is forced but the plan has no group rules
        # (gate_ok False), the full-key path is what actually executes —
        # fold that in once so the dispatch below and the recorded
        # last_uniqueness can't disagree about it
        use_gated = use_gated and gate_ok
        self.last_uniqueness = "gated" if use_gated else "full"
        # full-mode CASCADE: the conversation aggregate rolls up from the
        # per-(conv, turn) key counts — ONE key-width partial-agg shuffle
        # instead of a countDistinct-expanded conv shuffle (and when
        # uniqueness is also wanted, it reads the SAME stage for free:
        # measured 2.9s -> 1.0s for uniqueness+group on the 8M flagship).
        # Gated mode keeps its shape: there the conv agg exists precisely to
        # AVOID the key shuffle on clean data.
        use_cascade = (not use_gated and want_group and gk == self.key_cols[0]
                       and (not t.unique_keys
                            or set(t.unique_keys) == set(self.key_cols)))

        cached: list[DataFrame] = []
        table_parts: list[DataFrame] = []
        grouped = None
        if use_cascade:
            keyed = self._keyed_counts(df)
            if t.unique_keys:
                # two consumers (uniqueness + conv rollup) share the stage
                keyed = keyed.persist()
                cached.append(keyed)
                table_parts.append(self._uniqueness_from_keyed(keyed))
            table_parts.append(self._group_violations(
                df, self._grouped_from_keyed(keyed)))
        else:
            grouped = self._grouped(df) if want_group else None
            if use_gated and grouped is not None:
                # two consumers (group violations + dup gate) — persist the
                # O(convs) intermediate so the conv shuffle isn't paid twice
                grouped = grouped.persist()
                cached.append(grouped)
            if t.unique_keys:
                if use_gated:
                    table_parts.append(self._uniqueness_violations_gated(df, grouped))
                else:
                    table_parts.append(self._uniqueness_violations(df))
            if want_group:
                table_parts.append(self._group_violations(df, grouped))
        if t.referential and not ref_folded:
            table_parts.append(self._referential_violations(df, catalog))

        # violations (lazy row-level detail for sinks); schema_id is the
        # provenance key into spec_meta (C20/C21) — constant-folded by
        # Catalyst, costs nothing in the scan
        violations = self._row_violations(checked, row_rules)
        for p in table_parts:
            violations = violations.unionByName(p)
        violations = violations.withColumn(
            "schema_id", F.lit(self.plan.spec.schema_id))

        # verdicts: row-rule counts (incl. a folded referential) ride the row
        # scan; table-rule counts are tiny aggregations of the (small)
        # table-violation outputs
        part_str = F.col(self.part_col).cast("string").alias("part")
        fail_aggs = [
            F.sum((~F.col(_safe(r.rule_id))).cast("long")).alias(_safe(r.rule_id))
            for r in row_rules
        ]
        row_verdict = checked.groupBy(part_str).agg(
            F.count(F.lit(1)).alias("n_rows"), *fail_aggs)
        if row_rules:
            stack = ", ".join(
                f"'{r.rule_id}', `{_safe(r.rule_id)}`" for r in row_rules)
            row_long = row_verdict.selectExpr(
                "part", "n_rows",
                f"stack({len(row_rules)}, {stack}) as (rule_id, n_violations)",
            ).where(F.col("n_violations") > 0)
        else:
            row_long = row_verdict.select(
                "part", "n_rows", F.lit("x").alias("rule_id"),
                F.lit(0).alias("n_violations")).where(F.lit(False))

        n_rows = row_verdict.select("part", "n_rows")
        table_long = None
        for p in table_parts:
            c = p.groupBy("part", "rule_id").agg(F.count(F.lit(1)).alias("n_violations"))
            table_long = c if table_long is None else table_long.unionByName(c)
        if table_long is not None:
            table_long = table_long.join(n_rows, "part").select(
                "part", "n_rows", "rule_id", "n_violations")
            row_long = row_long.unionByName(table_long)

        verdicts = row_long.unionByName(
            n_rows.select("part", "n_rows", F.lit("__none__").alias("rule_id"),
                          F.lit(0).cast("long").alias("n_violations")))
        return ValidationResult(
            checked=checked,
            violations=violations,
            verdicts=verdicts,
            rule_ids=self.plan.rule_ids,
            spec_meta=self.plan.spec.meta(),
            _cached=cached,
        )
