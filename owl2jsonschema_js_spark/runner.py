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
  uniqueness   -> hash repartition on the FULL key (conv_id, turn_idx) + count
                  over the key partition: the full key spreads a hot conv_id
                  across partitions (turn_idx acts as the salt), which is the
                  salted repartition-and-sort-within-partitions strategy the
                  north rule mandates, realized with Catalyst operators.
  referential  -> broadcast left_anti join vs the (small) catalog (C19).

All heavy paths are pure DataFrame ops — zero Python in the row loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from owl2jsonschema_js_spark.compile import RulePlan

DEFAULT_PART_COL = "part"
VIOLATION_COLUMNS = ("part", "rule_id", "conv_id", "turn_idx", "observed")


def _safe(rule_id: str) -> str:
    return "ok__" + rule_id.replace(".", "_").replace("$", "doc")


@dataclass
class ValidationResult:
    """Lazy handles over the run's outputs; nothing is collected until asked."""

    checked: DataFrame          # input + ok__<rule> boolean columns + ok_all
    violations: DataFrame       # (part, rule_id, conv_id, turn_idx, observed)
    verdicts: DataFrame         # (part, n_rows, rule_id, n_violations) long-form
    rule_ids: list[str] = field(default_factory=list)

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
    ):
        self.plan = plan
        self.part_col = part_col
        self.key_cols = key_cols
        self.n_parts = n_parts

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

    def _row_checked(self, df: DataFrame) -> DataFrame:
        cols = {_safe(r.rule_id): r.ok for r in self.plan.row_rules}
        checked = df.withColumns(cols)
        ok_all = F.lit(True)
        for name in cols:
            ok_all = ok_all & F.col(name)
        return checked.withColumn("ok_all", ok_all)

    def _row_violations(self, checked: DataFrame) -> DataFrame:
        """One scan: per-row array of failing-rule structs, nulls compacted,
        exploded. Catalyst evaluates every ok column once (they're already in
        `checked`)."""
        k0, k1 = self.key_cols
        if not self.plan.row_rules:
            return checked.sparkSession.createDataFrame(
                [], f"part string, rule_id string, {k0} string, {k1} int, observed string")
        entries = F.array(*[
            F.when(
                ~F.col(_safe(r.rule_id)),
                F.struct(F.lit(r.rule_id).alias("rule_id"), r.observed.alias("observed")),
            )
            for r in self.plan.row_rules
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
        """C12 at table scope: duplicate (conv_id, turn_idx). Window over the
        FULL key == hash-repartition on the key + sort-within-partitions; the
        hot conversation is spread by turn_idx so no task gets the whole conv."""
        k0, k1 = self.key_cols
        w = Window.partitionBy(k0, k1)
        return (
            df.withColumn("__kcnt", F.count(F.lit(1)).over(w))
            .where(F.col("__kcnt") > 1)
            .select(
                F.col(self.part_col).cast("string").alias("part"),
                F.lit("table.unique").alias("rule_id"),
                F.col(k0), F.col(k1),
                F.col("__kcnt").cast("string").alias("observed"),
            )
        )

    def _cardinality_violations(self, df: DataFrame) -> DataFrame:
        """C5/C6 lifted to grouped-row scope: turns-per-conversation bounds.
        count() has map-side partial aggregation -> hot-key safe."""
        t = self.plan.table
        k0, k1 = self.key_cols
        gk = t.group_key or k0
        grouped = df.groupBy(gk).agg(
            F.count(F.lit(1)).alias("__n"),
            F.first(self.part_col).alias(self.part_col),
        )
        cond = F.lit(False)
        if t.min_items is not None:
            cond = cond | (F.col("__n") < t.min_items)
        if t.max_items is not None:
            cond = cond | (F.col("__n") > t.max_items)
        return grouped.where(cond).select(
            F.col(self.part_col).cast("string").alias("part"),
            F.lit("table.cardinality").alias("rule_id"),
            F.col(gk).alias(k0),
            F.lit(None).cast("int").alias(k1),
            F.col("__n").cast("string").alias("observed"),
        )

    def _contiguity_violations(self, df: DataFrame) -> DataFrame:
        """turn_idx must be the contiguous set {0..max} within each conversation.
        Window-free: min==0 ∧ max==n_distinct-1 ⇔ set-contiguity (duplicates are
        table.unique's concern, not contiguity's). count_distinct has partial
        aggregation -> hot-key safe."""
        t = self.plan.table
        k0, k1 = self.key_cols
        gk = t.contiguous or k0
        grouped = df.groupBy(gk).agg(
            F.countDistinct(F.col(k1)).alias("__n"),
            F.min(k1).alias("__mn"),
            F.max(k1).alias("__mx"),
            F.first(self.part_col).alias(self.part_col),
        )
        bad = grouped.where((F.col("__mn") != 0) | (F.col("__mx") != F.col("__n") - 1))
        return bad.select(
            F.col(self.part_col).cast("string").alias("part"),
            F.lit("table.contiguity").alias("rule_id"),
            F.col(gk).alias(k0),
            F.lit(None).cast("int").alias(k1),
            F.concat_ws(":", "__mn", "__mx", "__n").alias("observed"),
        )

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
        df = self._with_partition(df)
        checked = self._row_checked(df)
        parts: list[DataFrame] = [self._row_violations(checked)]

        t = self.plan.table
        if t.unique_keys:
            parts.append(self._uniqueness_violations(df))
        if t.min_items is not None or t.max_items is not None:
            parts.append(self._cardinality_violations(df))
        if t.contiguous:
            parts.append(self._contiguity_violations(df))
        if t.referential:
            parts.append(self._referential_violations(df, catalog))

        violations = parts[0]
        for p in parts[1:]:
            violations = violations.unionByName(p)

        n_rows = df.groupBy(F.col(self.part_col).cast("string").alias("part")) \
                   .agg(F.count(F.lit(1)).alias("n_rows"))
        vcounts = violations.groupBy("part", "rule_id") \
                            .agg(F.count(F.lit(1)).alias("n_violations"))
        verdicts = n_rows.join(vcounts, on="part", how="left").select(
            "part", "n_rows",
            F.coalesce("rule_id", F.lit("__none__")).alias("rule_id"),
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        ).where(F.col("rule_id") != "__none__").unionByName(
            n_rows.select("part", "n_rows",
                          F.lit("__none__").alias("rule_id"),
                          F.lit(0).alias("n_violations"))
        )
        return ValidationResult(
            checked=checked,
            violations=violations,
            verdicts=verdicts,
            rule_ids=self.plan.rule_ids,
        )
