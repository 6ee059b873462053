"""draft-4 keyword -> pyspark Column compiler (the engine core, SURVEY.md §2.4).

The reference compiles OWL axioms -> draft-4 keywords (createSchema,
``/root/reference/lib/index.js:832-1150``). This module is the mirror image: it
compiles those emitted keywords into vectorized Column predicate trees that
Catalyst fuses into a single WholeStageCodegen pass over the table.

Keyword -> predicate map (C-numbers are SURVEY.md §2.1 constraint rows):

    type                          -> static schema conformance / try_cast   (C1)
    minimum/maximum(+exclusive)   -> comparison chain                        (C2)
    pattern                       -> rlike (patterns are ^..$-anchored)      (C3)
    format                        -> FORMAT_PATTERNS rlike + ts cross-check  (C4)
    minItems/maxItems (array col) -> size() bounds                           (C5,C6)
    required                      -> isNotNull                               (C7)
    items.anyOf + additionalItems:true  -> exists()                          (C8)
    items.allOf + additionalItems:false -> forall()                          (C9)
    enum                          -> isin                                    (C10,C11)
    uniqueItems (array col)       -> size == size(array_distinct)            (C12)
    allOf / anyOf / oneOf / not   -> AND / OR / exactly-one / NOT            (C13-C16)
    $ref (in-document)            -> inline recursion                        (C19)

Null semantics (SURVEY.md §7 hard-part #4): draft-4 validates only *present*
values. SQL NULL is modeled as "absent": every property predicate is wrapped in
``when(col.isNull(), True)`` at the top, and only ``required`` (and the explicit
``type:'null'`` leaf, which is only meaningful inside combinators on non-null
rows) is null-sensitive. All produced Columns are non-null booleans so that
``~ok`` filters never silently drop rows.
"""

from __future__ import annotations

import functools
import operator
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from owl2jsonschema_js_spark.spec import ConstraintSpec, TableConstraints
from owl2jsonschema_js_spark.xsd_facets import FORMAT_PATTERNS

_MAX_REF_DEPTH = 8

# P13: the reference's legacy-spelling skip (lib/index.js:913-916)
_LEGACY_RE = re.compile(r"\(legacy spelling;")

# the table-scope rule identifiers the runner emits — single source of truth
# shared with RulePlan.rule_ids and evolve.merge_verdicts
TABLE_RULE_IDS = frozenset(
    {"table.unique", "table.cardinality", "table.referential",
     "table.contiguity"})


def _is_legacy(subschema: Any) -> bool:
    """P13 description test — also looks inside allOf wrappers, because
    merge_ancestors folds a same-key ancestor subschema (whose description
    carries the legacy marker) into {'allOf': [...]}; the skip must behave
    the same whether a doc is compiled standalone or post-merge."""
    if not isinstance(subschema, dict):
        return False
    if _LEGACY_RE.search(str(subschema.get("description", ""))):
        return True
    return any(_is_legacy(s) for s in subschema.get("allOf", ()) or ())

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass(frozen=True)
class RowRule:
    """One vectorized row-level rule: boolean `ok` Column + observed value."""

    rule_id: str
    key: str            # source column ('' for doc-level combinators)
    ok: Column          # non-null boolean
    observed: Column    # string representation for violation rows


@dataclass
class RulePlan:
    """Compiled plan: row rules evaluate in one scan; group/table rules are
    separate (shuffling) stages handled by the runner."""

    spec: ConstraintSpec
    row_rules: list[RowRule] = field(default_factory=list)
    table: TableConstraints = field(default_factory=TableConstraints)
    schema_issues: list[str] = field(default_factory=list)
    ignored: list[str] = field(default_factory=list)  # P13 skip-list hits

    @property
    def rule_ids(self) -> list[str]:
        ids = [r.rule_id for r in self.row_rules]
        t = self.table
        if t.unique_keys:
            ids.append("table.unique")
        if t.min_items is not None or t.max_items is not None:
            ids.append("table.cardinality")
        if t.referential:
            ids.append("table.referential")
        if t.contiguous:
            ids.append("table.contiguity")
        return ids


def _is_truthy_true(c: Column) -> bool:
    # cheap structural check for the lit(True) sentinel to skip no-op conjuncts
    return repr(c) == repr(F.lit(True))


def _and_all(preds: list[Column]) -> Column:
    preds = [p for p in preds if not _is_truthy_true(p)]
    if not preds:
        return F.lit(True)
    return functools.reduce(operator.and_, preds)


def _type_pred(json_type: Any, col: Column, dtype: T.DataType | None) -> Column:
    """C1 — type conformance. For columns whose Spark type statically
    guarantees the JSON type, constant-folds to True; for text-encoded payloads
    (string column, numeric/boolean declaration) a try_cast check; for a static
    mismatch, constant False (every present value violates)."""
    if isinstance(json_type, list):
        return functools.reduce(operator.or_, (_type_pred(t, col, dtype) for t in json_type))
    if json_type == "null":
        return col.isNull()
    if dtype is None:
        return F.lit(True)
    if json_type == "string":
        return F.lit(isinstance(dtype, (T.StringType, T.TimestampType, T.DateType, T.BinaryType)))
    if json_type == "boolean":
        if isinstance(dtype, T.BooleanType):
            return F.lit(True)
        if isinstance(dtype, T.StringType):
            return F.lower(col).isin("true", "false")
        return F.lit(False)
    if json_type == "integer":
        if isinstance(dtype, _INTEGRAL_TYPES):
            return F.lit(True)
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            # NOT floor()-equality: floor(double) returns BIGINT, so a
            # mathematically integral value beyond int64 (1e19) would clamp
            # and be falsely flagged; x % 1 == 0 stays in double space
            # (NaN/Infinity yield NaN -> NULL -> flagged via the null guard)
            return col % F.lit(1.0) == F.lit(0.0)
        if isinstance(dtype, T.DecimalType):
            return col == F.floor(col).cast(dtype)
        if isinstance(dtype, T.StringType):
            return col.try_cast("bigint").isNotNull()
        return F.lit(False)
    if json_type == "number":
        if isinstance(dtype, _NUMERIC_TYPES):
            return F.lit(True)
        if isinstance(dtype, T.StringType):
            return col.try_cast("double").isNotNull()
        return F.lit(False)
    if json_type == "array":
        return F.lit(isinstance(dtype, T.ArrayType))
    if json_type == "object":
        return F.lit(isinstance(dtype, (T.StructType, T.MapType)))
    raise ValueError(f"unknown JSON type {json_type!r}")


def _numeric_view(col: Column, dtype: T.DataType | None) -> Column:
    """Numeric comparisons on string columns go through try_cast."""
    if isinstance(dtype, T.StringType):
        return col.try_cast("double")
    return col


def _num_lit(v: Any) -> Column:
    """Numeric bound literal. Ints beyond int64 (xsd:unsignedLong's 2^64-1)
    become exact decimal literals — the reference loses these bounds to JS
    float precision (hardcoded-schemas.json:128-129); we keep them exact."""
    if isinstance(v, int) and not (-(2**63) <= v <= 2**63 - 1):
        return F.lit(str(v)).cast("decimal(38,0)")
    return F.lit(v)


def _format_pred(fmt: str, col: Column, dtype: T.DataType | None) -> Column:
    """C4 — table-driven format check. Timestamp/date columns carry the lexical
    guarantee in their type; string columns get rlike (+ parse cross-check for
    date-time, SURVEY.md C4)."""
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return F.lit(True)
    pat = FORMAT_PATTERNS.get(fmt)
    if pat is None:
        return F.lit(True)  # unknown formats are annotations in draft-4
    p = col.rlike(pat)
    if fmt == "date-time":
        p = p & F.try_to_timestamp(F.regexp_replace(col, r"Z$", "+00:00")).isNotNull()
    return p


def _element_type(dtype: T.DataType | None) -> T.DataType | None:
    return dtype.elementType if isinstance(dtype, T.ArrayType) else None


def compile_schema(
    schema: dict[str, Any],
    col: Column,
    dtype: T.DataType | None,
    spec: ConstraintSpec,
    depth: int = 0,
) -> Column:
    """Compile one subschema against one value expression -> pure (non-null-safe)
    boolean Column, assuming the value is present. Callers add the null guard."""
    if depth > _MAX_REF_DEPTH:
        # Self-recursive $ref ('#' inside possibleRef, lib/index.js:866-878) on a
        # flat column bottoms out: treat as vacuously true beyond the depth cap.
        return F.lit(True)
    preds: list[Column] = []

    if "$ref" in schema:
        target = spec.resolve_ref(schema["$ref"])
        preds.append(compile_schema(target, col, dtype, spec, depth + 1))

    if "type" in schema:
        preds.append(_type_pred(schema["type"], col, dtype))
    if "enum" in schema:
        preds.append(col.isin(*schema["enum"]))
    if "pattern" in schema:
        if isinstance(dtype, (T.TimestampType, T.DateType)):
            # lexical facet is guaranteed by the typed column (C3 on typed ts)
            pass
        else:
            preds.append(col.rlike(schema["pattern"]))
    if "format" in schema:
        preds.append(_format_pred(schema["format"], col, dtype))

    num = None
    if any(k in schema for k in ("minimum", "maximum")):
        num = _numeric_view(col, dtype)
    if "minimum" in schema:
        lo = _num_lit(schema["minimum"])
        preds.append(num > lo if schema.get("exclusiveMinimum") else num >= lo)
    if "maximum" in schema:
        hi = _num_lit(schema["maximum"])
        preds.append(num < hi if schema.get("exclusiveMaximum") else num <= hi)

    if "minLength" in schema:
        preds.append(F.length(col) >= F.lit(int(schema["minLength"])))
    if "maxLength" in schema:
        preds.append(F.length(col) <= F.lit(int(schema["maxLength"])))

    if isinstance(dtype, T.ArrayType):
        if "minItems" in schema:
            preds.append(F.size(col) >= F.lit(int(schema["minItems"])))
        if "maxItems" in schema:
            preds.append(F.size(col) <= F.lit(int(schema["maxItems"])))
        if schema.get("uniqueItems"):
            # C12 array scope: FunctionalProperty -> uniqueItems (lib/index.js:1059-1061)
            preds.append(F.size(col) == F.size(F.array_distinct(col)))
        items = schema.get("items")
        if isinstance(items, dict):
            et = _element_type(dtype)
            if "anyOf" in items and schema.get("additionalItems", True):
                # C8 someValuesFrom -> exists
                subs = items["anyOf"]
                preds.append(F.exists(col, lambda x: functools.reduce(
                    operator.or_, (compile_schema(s, x, et, spec, depth + 1) for s in subs))))
            elif "allOf" in items and not schema.get("additionalItems", True):
                # C9 allValuesFrom -> forall
                subs = items["allOf"]
                preds.append(F.forall(col, lambda x: _and_all(
                    [compile_schema(s, x, et, spec, depth + 1) for s in subs])))
            else:
                preds.append(F.forall(col, lambda x: compile_schema(items, x, et, spec, depth + 1)))

    # combinators (C13-C16): allOf=AND, anyOf=OR, oneOf=exactly-one (XOR-count,
    # SURVEY.md §7 hard-part #2), not=NOT
    if "allOf" in schema:
        preds.append(_and_all([compile_schema(s, col, dtype, spec, depth + 1) for s in schema["allOf"]]))
    if "anyOf" in schema:
        preds.append(functools.reduce(
            operator.or_, (compile_schema(s, col, dtype, spec, depth + 1) for s in schema["anyOf"])))
    if "oneOf" in schema:
        subs = [compile_schema(s, col, dtype, spec, depth + 1) for s in schema["oneOf"]]
        count = functools.reduce(operator.add, (s.cast("int") for s in subs))
        preds.append(count == F.lit(1))
    if "not" in schema:
        preds.append(~compile_schema(schema["not"], col, dtype, spec, depth + 1))

    return _and_all(preds)


# keyword -> rule grouping: one RowRule per (property, keyword-group) so verdicts
# and violations attribute to a specific constraint like the reference's
# per-keyword schema fields.
_KEYWORD_GROUPS: list[tuple[str, tuple[str, ...]]] = [
    ("type", ("type",)),
    ("enum", ("enum",)),
    ("pattern", ("pattern",)),
    ("format", ("format",)),
    ("range", ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum")),
    ("length", ("minLength", "maxLength")),
    ("items", ("minItems", "maxItems", "uniqueItems", "items", "additionalItems")),
    ("combinator", ("allOf", "anyOf", "oneOf", "not", "$ref")),
]


def _null_guarded(pure: Column, col: Column) -> Column:
    return F.when(col.isNull(), F.lit(True)).otherwise(F.coalesce(pure, F.lit(False)))


def compile_spec(spec: ConstraintSpec, df_schema: T.StructType) -> RulePlan:
    """Compile a full ConstraintSpec against a DataFrame schema -> RulePlan.

    Pure driver-side function (compile once, broadcast implicitly — the lesson
    from the reference's memoize-nothing closure walk, SURVEY.md §4.1)."""
    plan = RulePlan(spec=spec, table=spec.table)
    fields = {f.name: f.dataType for f in df_schema.fields}

    # C7: minItems>0 => required (lib/index.js:1074-1079) surfaces here as the
    # doc-level `required` list -> isNotNull rules.
    for key in spec.required:
        # P13 also governs required: in the reference an ignored key never
        # enters schema.properties and therefore can never be pushed into
        # required (lib/index.js:913-916 vs 1077) — so a skip-listed or
        # legacy-marked key in a hand-written doc's required list must not
        # emit an isNotNull rule either. Recorded in plan.ignored like the
        # properties loop (dedup'd — the key may hit both loops).
        if key in spec.ignore_properties or _is_legacy(spec.properties.get(key)):
            if key not in plan.ignored:
                plan.ignored.append(key)
            continue
        if key not in fields:
            plan.schema_issues.append(f"required key {key!r} missing from table schema")
            continue
        col = F.col(key)
        plan.row_rules.append(RowRule(
            rule_id=f"{key}.required", key=key,
            ok=col.isNotNull(), observed=F.lit("null"),
        ))

    for key, subschema in spec.properties.items():
        # P13 — schema.org ignore-filter: skip the property entirely when its
        # key is on the skip-list or its description carries the legacy-
        # spelling marker (lib/index.js:913-916 + lib/ignore-properties.json),
        # including a marker folded into an allOf wrapper by merge_ancestors.
        # Compile-time set lookup here; at scale, were properties rows instead
        # of spec entries, this is a broadcast isin + rlike anti-filter.
        if key in spec.ignore_properties or _is_legacy(subschema):
            if key not in plan.ignored:
                plan.ignored.append(key)
            continue
        if key not in fields:
            plan.schema_issues.append(f"property {key!r} missing from table schema")
            continue
        dtype = fields[key]
        col = F.col(key)
        for group_name, kws in _KEYWORD_GROUPS:
            picked = {k: subschema[k] for k in kws if k in subschema}
            if not picked:
                continue
            if group_name == "range":
                # exclusivity flags ride along with minimum/maximum
                for ex in ("exclusiveMinimum", "exclusiveMaximum"):
                    if ex in subschema:
                        picked[ex] = subschema[ex]
            if group_name == "items" and isinstance(dtype, T.ArrayType) is False \
                    and not any(k in picked for k in ("items",)):
                # scalar column with minItems/maxItems handled at table scope
                continue
            pure = compile_schema(picked, col, dtype, spec)
            if _is_truthy_true(pure):
                continue
            plan.row_rules.append(RowRule(
                rule_id=f"{key}.{group_name}", key=key,
                ok=_null_guarded(pure, col),
                observed=F.coalesce(col.cast("string"), F.lit("null")),
            ))

    # doc-level combinators apply to the whole row; compiled per-subschema over
    # their referenced properties. External $refs inside doc-level allOf (schema
    # inheritance C13, lib/index.js:896-898) are resolved by the caller merging
    # ancestor docs before parse; in-document ones resolve here.
    for comb, val in spec.combinators.items():
        subs = val if isinstance(val, list) else [val]
        in_doc = [s for s in subs if not (isinstance(s, dict) and isinstance(s.get("$ref"), str)
                                          and not s["$ref"].startswith("#"))]
        dropped = [s["$ref"] for s in subs if s not in in_doc]
        if dropped:
            # external refs are resolvable only pre-parse (merge_ancestors);
            # at compile time dropping one is sound ONLY for allOf (a subset
            # conjunction under-validates but never mis-validates). For
            # anyOf/oneOf/not a truncated member list flips semantics —
            # anyOf turns stricter (false violations), oneOf's exactly-one
            # count is wrong both ways — so those rules are skipped whole,
            # and every drop is recorded instead of silent.
            plan.schema_issues.append(
                f"doc-level {comb} drops unresolved external $refs "
                f"{dropped!r} (merge_ancestors resolves these pre-parse"
                + ("" if comb == "allOf" else
                   "; rule skipped — a truncated member list would change "
                   f"{comb} semantics") + ")")
            if comb != "allOf":
                continue
        if not in_doc:
            continue
        preds = [_compile_row_subschema(s, spec, fields) for s in in_doc]
        if comb == "allOf":
            pure = _and_all(preds)
        elif comb == "anyOf":
            pure = functools.reduce(operator.or_, preds)
        elif comb == "oneOf":
            pure = functools.reduce(operator.add, (p.cast("int") for p in preds)) == F.lit(1)
        else:  # not
            pure = ~preds[0]
        if _is_truthy_true(pure):
            continue
        plan.row_rules.append(RowRule(
            rule_id=f"$.{comb}", key="",
            ok=F.coalesce(pure, F.lit(False)),
            observed=F.lit(""),
        ))

    # C17 — disjointWith exclusivity (optional; the reference captures
    # owl:disjointWith but never emits it, lib/index.js:606-614): two row
    # subschemas must not BOTH hold -> ok = ~(predA & predB).
    for i, dj in enumerate(spec.disjoint):
        pa = _compile_row_subschema(dj["a"], spec, fields)
        pb = _compile_row_subschema(dj["b"], spec, fields)
        plan.row_rules.append(RowRule(
            rule_id=f"$.disjoint.{dj.get('id', i)}", key="",
            ok=F.coalesce(~(pa & pb), F.lit(True)),
            observed=F.lit(""),
        ))
    return plan


def _compile_row_subschema(schema: dict, spec: ConstraintSpec,
                           fields: dict[str, T.DataType],
                           depth: int = 0) -> Column:
    """A row-scope subschema (inside doc-level combinators): its `properties` /
    `required` apply to the row's columns; everything else is ignored at row
    scope. Depth-capped like compile_schema: a self-recursive '#' ref (the
    shape the reference emits, lib/index.js:866-878) bottoms out vacuously
    true instead of recursing forever at compile time."""
    if depth > _MAX_REF_DEPTH:
        return F.lit(True)
    preds: list[Column] = []
    if "$ref" in schema:
        preds.append(_compile_row_subschema(
            spec.resolve_ref(schema["$ref"]), spec, fields, depth + 1))
    for key in schema.get("required", ()):
        if key in fields:
            preds.append(F.col(key).isNotNull())
    for key, sub in (schema.get("properties") or {}).items():
        if key not in fields:
            continue
        col = F.col(key)
        pure = compile_schema(sub, col, fields[key], spec)
        preds.append(_null_guarded(pure, col))
    for comb in ("allOf", "anyOf", "oneOf", "not"):
        if comb not in schema:
            continue
        subs = schema[comb] if isinstance(schema[comb], list) else [schema[comb]]
        sub_preds = [_compile_row_subschema(s, spec, fields, depth + 1)
                     for s in subs]
        if comb == "allOf":
            preds.append(_and_all(sub_preds))
        elif comb == "anyOf":
            preds.append(functools.reduce(operator.or_, sub_preds))
        elif comb == "oneOf":
            preds.append(functools.reduce(operator.add, (p.cast("int") for p in sub_preds)) == F.lit(1))
        else:
            preds.append(~sub_preds[0])
    return _and_all(preds)
