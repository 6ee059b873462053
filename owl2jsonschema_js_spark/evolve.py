"""Constraint evolution: diff two compiled spec versions, revalidate only the
delta.

The checkpoint manifest keys entries on (snapshot | partition |
constraint_version), so naively ANY edit to the constraint doc invalidates
every partition and re-runs every rule over the full table — at 10^12 rows
that is a full 100 TB pass for a one-keyword change. But rules are independent
conjuncts and verdicts are stored long-form per rule: for the SAME snapshot,
per-rule counts from the old version stay valid for every rule whose compiled
predicate is unchanged. This module computes the rule-level delta and stitches
old + delta verdicts into the full new-version verdict.

The reference has no counterpart (it recompiles the whole ontology every run,
memoizing nothing — SURVEY.md §4.1); this is the evaluation-side feature its
output format makes possible: rule identity = (rule_id, compiled expression).

Rule signatures come from the COMPILED Column expression (its canonical
string form), not from re-implementing compile_spec's grouping — so the diff
can never drift from what the compiler actually does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from owl2jsonschema_js_spark.compile import TABLE_RULE_IDS, RulePlan
from owl2jsonschema_js_spark.spec import TableConstraints

# PySpark mints a fresh lambda-variable id per compile (x_1, x_2, ...) inside
# higher-order functions, so the raw repr of an exists/forall rule differs
# between two compiles of the SAME doc. A blanket `\bx_\d+\b` rewrite would
# also hit genuine columns named x_1/x_2 and would conflate distinct nested
# lambda variables — so the rewrite is ANCHORED to declaration sites: the
# repr renders every lambda as `x_1 -> body` / `(x_3, y_4) -> body`, and only
# names that appear in such a declaration are renumbered (positionally, in
# first-declaration order). An undeclared `x_3` token is a real column
# reference and keeps its identity in the signature.
_LAMBDA_DECL = re.compile(
    r"(?:\((\w+_\d+(?:,\s*\w+_\d+)*)\)|(\w+_\d+))\s*->")


def _normalize_lambdas(expr: str) -> str:
    declared: list[str] = []
    for m in _LAMBDA_DECL.finditer(expr):
        names = (m.group(1) or m.group(2)).replace(" ", "").split(",")
        for n in names:
            if n not in declared:
                declared.append(n)
    for i, name in enumerate(declared):
        expr = re.sub(rf"\b{re.escape(name)}\b", f"λ{i}", expr)
    return expr


def _signatures(plan: RulePlan) -> dict[str, str]:
    # guard the one remaining ambiguity: a real column whose name collides
    # with a freshly-minted lambda variable inside the SAME expression is
    # indistinguishable in the repr — reject instead of mis-diffing.
    colnames = set(plan.spec.properties) | set(plan.spec.required)
    out: dict[str, str] = {}
    for r in plan.row_rules:
        expr = repr(r.ok)
        declared = {n for m in _LAMBDA_DECL.finditer(expr)
                    for n in (m.group(1) or m.group(2)).replace(" ", "").split(",")}
        clash = declared & colnames
        if clash:
            raise ValueError(
                f"cannot compute a stable rule signature for {r.rule_id!r}: "
                f"column name(s) {sorted(clash)} collide with Spark lambda-"
                "variable names (x_<n>); rename the column(s)")
        out[r.rule_id] = _normalize_lambdas(expr)
    return out


@dataclass
class PlanDiff:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    changed: list[str] = field(default_factory=list)
    table_changed: bool = False

    @property
    def delta_rule_ids(self) -> set[str]:
        return set(self.added) | set(self.changed)

    @property
    def is_noop(self) -> bool:
        return not (self.added or self.removed or self.changed
                    or self.table_changed)


def plan_diff(old: RulePlan, new: RulePlan) -> PlanDiff:
    """Rule-level diff between two compiled plans (same table schema)."""
    so, sn = _signatures(old), _signatures(new)
    return PlanDiff(
        added=sorted(set(sn) - set(so)),
        removed=sorted(set(so) - set(sn)),
        changed=sorted(k for k in set(so) & set(sn) if so[k] != sn[k]),
        table_changed=old.table != new.table,
    )


def delta_plan(old: RulePlan, new: RulePlan) -> tuple[RulePlan, PlanDiff]:
    """A plan containing ONLY the new version's added/changed row rules, plus
    the table constraints iff any of them changed. Running it over the same
    snapshot costs one scan of the delta rules instead of a full revalidation;
    on a columnar source it reads only the delta rules' columns."""
    d = plan_diff(old, new)
    sub = RulePlan(
        spec=new.spec,
        row_rules=[r for r in new.row_rules if r.rule_id in d.delta_rule_ids],
        table=new.table if d.table_changed else TableConstraints(),
        schema_issues=list(new.schema_issues),
        ignored=list(new.ignored),
    )
    return sub, d


def merge_verdicts(old_verdicts: dict, delta_verdicts: dict,
                   diff: PlanDiff) -> dict:
    """Stitch {part: {n_rows, pass, rules}} of the old full run and the delta
    run into the verdict the new version's FULL run would produce on the same
    snapshot: delta rules take the delta counts, removed rules drop, unchanged
    rules keep their old counts; `pass` is recomputed. Table-rule counts
    follow the same logic via diff.table_changed (delta re-ran them)."""
    drop = set(diff.removed) | diff.delta_rule_ids
    if diff.table_changed:
        drop |= TABLE_RULE_IDS
    out: dict = {}
    for part, ov in old_verdicts.items():
        rules = {k: v for k, v in ov.get("rules", {}).items() if k not in drop}
        dv = delta_verdicts.get(part, {})
        rules.update(dv.get("rules", {}))
        out[part] = {"n_rows": ov["n_rows"], "rules": rules,
                     "pass": not rules}
    # partitions that appear only in the delta run (new data would need a new
    # snapshot, so this is defensive)
    for part, dv in delta_verdicts.items():
        out.setdefault(part, {"n_rows": dv["n_rows"],
                              "rules": dict(dv.get("rules", {})),
                              "pass": not dv.get("rules", {})})
    return out
