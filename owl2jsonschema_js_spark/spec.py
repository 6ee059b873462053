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
        mi, ma = tc.get("minItems"), tc.get("maxItems")
        group_key = None
        min_items = max_items = None
        if isinstance(mi, dict):
            group_key, min_items = mi.get("per"), int(mi["value"])
        if isinstance(ma, dict):
            gk2 = ma.get("per")
            if group_key is not None and gk2 != group_key:
                raise ValueError("minItems/maxItems must share the same 'per' group key")
            group_key, max_items = gk2, int(ma["value"])

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
        )

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
