"""Canonical constraint documents (FIXTURES.md F3).

`transcript_constraints()` is the engine's flagship spec: a draft-4 document in
the exact emitted shape of the reference (skeleton at
``/root/reference/lib/index.js:832-847``), whose `ts` pattern is the reference's
own xsd:dateTime lexical pattern (``/root/reference/lib/hardcoded-schemas.json:17``)
and whose `possibleRef` definition mirrors ``lib/index.js:866-878``. Table-scope
keys under ``x-table-constraints`` carry uniqueItems (FunctionalProperty,
``lib/index.js:1059-1061``) and min/maxItems (owl:cardinality,
``lib/index.js:355-361``) lifted from array scope to grouped-row scope.
"""

from __future__ import annotations

from owl2jsonschema_js_spark.xsd_facets import XSD_FACETS

ROLES = ["user", "assistant", "system", "tool"]


def transcript_constraints() -> dict:
    return {
        "id": "Transcript.json",
        "title": "transcript turn",
        "type": "object",
        "required": ["conv_id", "turn_idx", "role", "text", "ts"],
        "properties": {
            "conv_id": {"type": "string", "pattern": r"^conv_[0-9]{8}$"},
            "turn_idx": {
                "type": "integer",
                "minimum": 0,
                "exclusiveMinimum": False,
                "maximum": 2147483647,
            },
            "role": {"type": "string", "enum": ROLES},
            "text": {"type": "string"},
            "tool": {
                "oneOf": [
                    {"type": "null"},
                    {"type": "string", "format": "uri-reference"},
                ]
            },
            "ts": {
                "type": "string",
                "format": "date-time",
                "pattern": XSD_FACETS["dateTime"]["pattern"],
            },
        },
        "definitions": {
            "possibleRef": {"oneOf": [{"$ref": "#"}, {"type": "string", "format": "uri"}]}
        },
        "x-table-constraints": {
            "uniqueItems": ["conv_id", "turn_idx"],
            "minItems": {"per": "conv_id", "value": 1},
            "maxItems": {"per": "conv_id", "value": 100000},
            "referential": {"column": "tool", "table": "tool_catalog", "key": "tool"},
            "contiguous": "conv_id",
        },
    }


def combinator_constraints() -> dict:
    """Second doc exercising allOf/anyOf/oneOf/not (lib/index.js:643-662,
    1138-1146) and exists/forall emissions (someValuesFrom/allValuesFrom,
    lib/index.js:1082-1100) over an ArrayType column `tags`."""
    return {
        "id": "TurnExt.json",
        "title": "turn with tags",
        "type": "object",
        "required": ["conv_id"],
        "properties": {
            "role": {
                "allOf": [{"type": "string"}],
                "anyOf": [{"enum": ["user", "assistant"]}, {"enum": ["system", "tool"]}],
                "not": {"enum": ["narrator"]},
            },
            "turn_idx": {
                "oneOf": [
                    {"type": "integer", "maximum": 9, "minimum": 0},
                    {"type": "integer", "minimum": 10},
                ]
            },
            "tags": {
                "type": "array",
                "minItems": 1,
                "maxItems": 8,
                "uniqueItems": True,
                # someValuesFrom: at least one tag matches one of the refs (C8)
                "items": {"anyOf": [{"pattern": "^t[0-9]+$"}, {"enum": ["pinned"]}]},
                "additionalItems": True,
            },
            "attrs": {
                "type": "array",
                # allValuesFrom: every element matches all refs (C9)
                "items": {"allOf": [{"type": "string"}, {"pattern": "^[a-z]+$"}]},
                "additionalItems": False,
            },
        },
    }
