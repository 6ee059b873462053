"""ConstraintSpec — typed view of a canonical draft-4 constraint document.

The input format is exactly what the reference *emits* per class
(``/root/reference/lib/index.js:832-847`` skeleton, trimmed at ``141-159``):

    {id, title, description, type:'object', required:[...],
     properties:{key: subschema}, allOf/anyOf/oneOf/not, definitions, links}

plus an engine extension block ``x-table-constraints`` for the constraints the
reference expresses at array scope but we evaluate at grouped-row scope
(FIXTURES.md F3): uniqueItems -> table key uniqueness (C12), minItems/maxItems
per group -> cardinality (C5/C6), referential -> $ref integrity (C19).

Parsing happens once, on the driver (the spec document is tiny — the analog of
the reference compiling the whole ontology in memory); the compiled plan is then
broadcast implicitly inside Column expression trees.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class TableConstraints:
    """Grouped/table-scope constraints (engine extension, FIXTURES.md F3)."""

    unique_keys: tuple[str, ...] = ()          # uniqueItems -> (conv_id, turn_idx)
    group_key: str | None = None               # minItems/maxItems 'per' column
    min_items: int | None = None
    max_items: int | None = None
    referential: dict[str, str] | None = None  # {column, table, key}
    contiguous: str | None = None              # turn_idx contiguity within group_key


@dataclass
class ConstraintSpec:
    """A parsed draft-4 constraint document."""

    doc: dict[str, Any]
    schema_id: str = ""
    title: str = ""
    required: tuple[str, ...] = ()
    properties: dict[str, dict] = field(default_factory=dict)
    definitions: dict[str, dict] = field(default_factory=dict)
    combinators: dict[str, Any] = field(default_factory=dict)  # allOf/anyOf/oneOf/not at doc level
    table: TableConstraints = field(default_factory=TableConstraints)
    # C20/C21 metadata the reference keeps in every schema (lib/index.js:442,
    # 957-999): carried into run provenance (violation rows get schema_id;
    # translations/links ride the checkpoint manifest — normalized, never
    # denormalized onto 10^12 violation rows).
    translations: dict[str, dict] = field(default_factory=dict)
    links: list = field(default_factory=list)
    # P13: schema.org ignore-filter (lib/ignore-properties.json +
    # lib/index.js:913-916) — property keys whose rules are skipped at compile.
    ignore_properties: frozenset = frozenset()
    # C17: owl:disjointWith exclusivity (captured but never emitted by the
    # reference, lib/index.js:606-614) — engine extension `x-disjoint`:
    # [{id?, a: subschema, b: subschema}] -> rule ~(predA & predB).
    disjoint: tuple = ()

    @property
    def version(self) -> str:
        """Content hash — the `constraint version` carried in checkpoint lineage
        (BASELINE.json:6). Canonical sorted-keys JSON, mirroring the reference's
        deterministic serializer idea (lib/pretty-json.js:36-38)."""
        blob = json.dumps(self.doc, sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    @classmethod
    def parse(cls, doc: dict[str, Any] | str) -> "ConstraintSpec":
        if isinstance(doc, str):
            doc = json.loads(doc)
        if not isinstance(doc, dict):
            raise TypeError("constraint doc must be a JSON object")
        t = doc.get("type", "object")
        if t != "object":
            raise ValueError(f"top-level constraint doc must be type:'object', got {t!r}")

        tc = doc.get("x-table-constraints", {}) or {}

        def _card(v: Any, name: str) -> tuple[str | None, int | None]:
            """(per, value) from either the {'per': col, 'value': n} shape or
            a bare number (per=None -> the runner's default group key). Any
            other type raises — a silently-dropped bound is a constraint the
            author believes is active but never runs."""
            if v is None:
                return None, None
            if isinstance(v, dict):
                return v.get("per"), int(v["value"])
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return None, int(v)
            raise ValueError(
                f"x-table-constraints.{name} must be a number or "
                f"{{'per': col, 'value': n}}, got {type(v).__name__}")

        mi_per, min_items = _card(tc.get("minItems"), "minItems")
        ma_per, max_items = _card(tc.get("maxItems"), "maxItems")
        if min_items is not None and max_items is not None and mi_per != ma_per:
            raise ValueError("minItems/maxItems must share the same 'per' group key")
        group_key = mi_per if min_items is not None else ma_per

        table = TableConstraints(
            unique_keys=tuple(tc.get("uniqueItems", ()) or ()),
            group_key=group_key,
            min_items=min_items,
            max_items=max_items,
            referential=tc.get("referential"),
            contiguous=tc.get("contiguous"),
        )
        return cls(
            doc=doc,
            schema_id=doc.get("id", ""),
            title=doc.get("title", ""),
            required=tuple(doc.get("required", ()) or ()),
            properties=dict(doc.get("properties", {}) or {}),
            definitions=dict(doc.get("definitions", {}) or {}),
            combinators={k: doc[k] for k in ("allOf", "anyOf", "oneOf", "not") if k in doc},
            table=table,
            translations=dict(doc.get("translations", {}) or {}),
            links=list(doc.get("links", ()) or ()),
            ignore_properties=frozenset(doc.get("x-ignore-properties", ()) or ()),
            disjoint=tuple(doc.get("x-disjoint", ()) or ()),
        )

    def meta(self) -> dict[str, Any]:
        """Schema metadata for provenance (manifest lineage): the fields the
        reference carries in every emitted schema but never evaluates —
        translations (C21, lib/index.js:442,458-468) and hyperschema links
        (C20, lib/index.js:957-999) — plus id/title/version."""
        return {
            "schema_id": self.schema_id,
            "title": self.title,
            "constraint_version": self.version,
            "translations": self.translations,
            "links": self.links,
        }

    @staticmethod
    def _external_refs(doc: dict[str, Any]) -> list[str]:
        """External `$ref`s in the doc-level allOf — the reference's subclass
        inheritance emission `allOf:[{$ref:'<Supertype>'+suffix}]`
        (lib/index.js:896-898) — plus `x-equivalent` ids (J5: the reference
        captures owl:equivalentClass/equivalentProperty into `equivalents[]`
        and merges anonymous-restriction constraints, lib/index.js:568-586;
        equivalence means identical class extension, so the equivalent's rule
        set unions in exactly like an ancestor's)."""
        out = []
        for s in doc.get("allOf", ()) or ():
            if (isinstance(s, dict) and isinstance(s.get("$ref"), str)
                    and not s["$ref"].startswith("#")):
                out.append(s["$ref"])
        out += [r for r in (doc.get("x-equivalent", ()) or ())
                if isinstance(r, str)]
        return out

    @classmethod
    def merge_ancestors(cls, root: str, docs: dict[str, dict]) -> "ConstraintSpec":
        """Cross-document supertype inheritance merge (C13/J4).

        The reference walks the `subClassOf` chain transitively, reversing it
        root-first (lib/index.js:537-566, reverse at 567), and emits each
        subclass schema with ``allOf:[{$ref:'<Supertype>.json'}]``
        (lib/index.js:896-898). This classmethod is the evaluation-side
        counterpart: given the full document set, it resolves those external
        refs transitively (cycle-safe, dedup'd like `arrayUnique`,
        lib/index.js:64-73) and folds the chain into ONE spec whose rule set
        is the draft-4-allOf conjunction of every document root-first:

          * ``required``: ordered union.
          * ``properties``: same key in several docs -> ``{"allOf":[subs]}``
            (all constraints apply, child never overrides an ancestor).
          * residual doc-level combinators: collected into the merged allOf.
          * ``x-table-constraints``: conjunction — tightest min/max bounds;
            later (child) docs win for unique/referential/contiguous.
          * translations/links metadata (C20/C21): merged / concatenated.

        The merged doc records the chain in ``x-ancestors`` so provenance
        (and the manifest) can show which documents contributed."""
        def lookup(ref: str) -> str:
            if ref in docs:
                return ref
            base = ref.rsplit("/", 1)[-1]
            if base in docs:
                return base
            raise KeyError(f"unresolved external $ref {ref!r} "
                           f"(known docs: {sorted(docs)})")

        chain: list[str] = []
        seen: set[str] = set()

        def walk(did: str) -> None:
            if did in seen:   # cycle-safe (the reference's indexOf guard)
                return
            seen.add(did)
            for ref in cls._external_refs(docs[did]):
                walk(lookup(ref))
            chain.append(did)  # post-order => ancestors (root) first

        walk(lookup(root))
        child = docs[lookup(root)]

        required: list[str] = []
        props: dict[str, list] = {}
        definitions: dict[str, dict] = {}
        inline_combs: list = []
        translations: dict[str, dict] = {}
        links: list = []
        ignore: list[str] = []
        disjoint: list = []
        tc: dict[str, Any] = {}
        for did in chain:
            d = docs[did]
            for k in d.get("required", ()) or ():
                if k not in required:
                    required.append(k)
            for k, sub in (d.get("properties") or {}).items():
                props.setdefault(k, []).append(sub)
            for name, body in (d.get("definitions") or {}).items():
                # dict.update here would silently rebind an ancestor's
                # #/definitions/<name> $refs to the child's version — the
                # merged doc would no longer validate like jsonschema with a
                # per-document ref store. Identical bodies fold; conflicts
                # raise (mirroring the cardinality-group conflict below).
                if name in definitions and definitions[name] != body:
                    raise ValueError(
                        f"conflicting definition {name!r} across the "
                        f"inheritance chain: {did} redefines it with a "
                        "different body (namespace your definitions per doc)")
                definitions[name] = body
            ext = set(cls._external_refs(d))
            inline_combs += [s for s in (d.get("allOf") or ())
                             if not (isinstance(s, dict) and s.get("$ref") in ext)]
            inline_combs += [{c: d[c]} for c in ("anyOf", "oneOf", "not") if c in d]
            for fld, by_lang in (d.get("translations") or {}).items():
                translations.setdefault(fld, {}).update(by_lang)
            links += d.get("links") or []
            ignore += [k for k in (d.get("x-ignore-properties") or ()) if k not in ignore]
            disjoint += d.get("x-disjoint") or []
            dtc = d.get("x-table-constraints") or {}
            for k, v in dtc.items():
                if k in ("minItems", "maxItems") and not isinstance(v, dict):
                    # bare-number shorthand (parse() accepts it) — normalize
                    # to the dict shape the tightest-bound merge below reads
                    v = {"per": None, "value": v}
                if k in ("minItems", "maxItems") and k in tc:
                    # conjunction = tightest bound, but only over the SAME
                    # group key — silently keeping one of two different-'per'
                    # bounds would drop a constraint with no error
                    if tc[k].get("per") != v.get("per"):
                        raise ValueError(
                            f"cannot merge {k} over different group keys: "
                            f"{tc[k].get('per')!r} (ancestor) vs "
                            f"{v.get('per')!r} ({did})")
                    pick = max if k == "minItems" else min
                    tc[k] = pick(tc[k], v, key=lambda x: x["value"])
                else:
                    # uniqueItems/referential/contiguous have no tightest-bound
                    # conjunction: last-writer-wins would silently DROP the
                    # ancestor's table constraint (e.g. referential declared on
                    # one column by Base, another by Child) — violations of the
                    # dropped one would then pass with no error. Equal
                    # re-declarations fold; true conflicts raise, like the
                    # cardinality group-key conflict above.
                    if k in tc and tc[k] != v:
                        raise ValueError(
                            f"cannot merge x-table-constraints.{k}: "
                            f"{tc[k]!r} (ancestor) vs {v!r} ({did}) — "
                            "conjunction of differing table constraints is "
                            "not supported; align the chain or evaluate both "
                            "docs separately")
                    tc[k] = v

        merged: dict[str, Any] = {
            "type": "object",
            "id": child.get("id", root),
            "title": child.get("title", ""),
        }
        if required:
            merged["required"] = required

        def _dedup(subs: list) -> list:
            # identical subschema contributed twice (diamond inheritance) —
            # dedup like the reference's self-$ref dedup (lib/index.js:1025-1030)
            out, keys = [], set()
            for s in subs:
                k = json.dumps(s, sort_keys=True)
                if k not in keys:
                    keys.add(k)
                    out.append(s)
            return out

        merged["properties"] = {
            k: (ss[0] if len(ss := _dedup(subs)) == 1 else {"allOf": ss})
            for k, subs in props.items()
        }
        if definitions:
            merged["definitions"] = definitions
        if inline_combs:
            merged["allOf"] = inline_combs
        if translations:
            merged["translations"] = translations
        if links:
            merged["links"] = links
        if ignore:
            merged["x-ignore-properties"] = ignore
        if disjoint:
            merged["x-disjoint"] = disjoint
        if tc:
            merged["x-table-constraints"] = tc
        merged["x-ancestors"] = chain[:-1]
        return cls.parse(merged)

    def resolve_ref(self, ref: str) -> dict[str, Any]:
        """Resolve an in-document ``$ref`` (``#`` or ``#/definitions/name``).

        External refs (other schema files, ``{+$}`` hyperschema links —
        lib/index.js:866-894) are referential-integrity checks, not inline
        subschemas; callers handle those via TableConstraints.referential.
        """
        if ref == "#":
            return self.doc
        prefix = "#/definitions/"
        if ref.startswith(prefix):
            name = ref[len(prefix):]
            if name not in self.definitions:
                raise KeyError(f"unknown $ref {ref!r}")
            return self.definitions[name]
        raise KeyError(f"unsupported external $ref {ref!r} (use x-table-constraints.referential)")
