"""XSD datatype facet table — the constraint-vocabulary data the reference compiles from.

This is the engine's analog of the reference's hardcoded type authority
(``/root/reference/lib/hardcoded-schemas.json``, consumed via ``getHardcoded`` at
``/root/reference/lib/index.js:49-51``): a name -> {type, format, pattern,
minimum/maximum, exclusiveMinimum/Maximum} table driving predicate generation.

Ported as *data* (semantics, not code), with documented corrections:
 * ``unsignedShort.maximum`` is 65535 here (reference has an off-by-one 65536 at
   ``lib/hardcoded-schemas.json:177``).
 * ``long``/``unsignedLong`` bounds are exact int64/uint64 (the reference stores
   them as JS floats which cannot represent them exactly,
   ``lib/hardcoded-schemas.json:128-129``).
 * the ~4,700-char anyURI regex (``lib/hardcoded-schemas.json:198``) is replaced by
   a compact RFC-3986 scheme check with equivalent accept behavior on well-formed
   absolute URIs.

Patterns are anchored (``^...$``) exactly like the reference's, so ``rlike`` gives
full-match semantics even though draft-4 ``pattern`` is nominally regex *search*
(SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

# Lexical patterns for the XSD date/time family (reference: hardcoded-schemas.json:14-74).
_P_DATETIME = (
    r"^(-?(?:[1-9][0-9]*)?[0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9])"
    r"T(2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
    r"(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
)
_P_DATE = (
    r"^(-?(?:[1-9][0-9]*)?[0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9])"
    r"(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
)
_P_TIME = (
    r"^(2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(\.[0-9]+)?"
    r"(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
)
_P_DURATION = r"^-?P(?=[0-9]|T)([0-9]+Y)?([0-9]+M)?([0-9]+D)?(T(?=[0-9])([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$"
_P_GYEARMONTH = r"^(-?(?:[1-9][0-9]*)?[0-9]{4})-(1[0-2]|0[1-9])(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
_P_GYEAR = r"^(-?(?:[1-9][0-9]*)?[0-9]{4})(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
_P_GMONTHDAY = r"^--(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9])(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
_P_GDAY = r"^---(3[01]|0[1-9]|[12][0-9])(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
_P_GMONTH = r"^--(1[0-2]|0[1-9])(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?$"
# Compact RFC-3986 absolute-URI / relative-ref acceptor (deviation from reference, see module doc).
_P_ANYURI = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?(?://[^\s/?#]*)?[^\s?#]*(?:\?[^\s#]*)?(?:#\S*)?$"
_P_NORMALIZED = r"^[^\r\n\t]*$"
_P_TOKEN = r"^(?:[^\s]+(?: [^\s]+)*)?$"
_P_LANGUAGE = r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$"
_P_NMTOKEN = r"^[-.:\w]+$"
_P_NAME = r"^[:A-Za-z_][-.:\w]*$"
_P_NCNAME = r"^[A-Za-z_][-.\w]*$"
_P_BASE64 = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
_P_HEX = r"^(?:[0-9a-fA-F]{2})*$"

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1

# name -> facet dict. Keys mirror the draft-4 keywords the reference emits:
# type, format, pattern, minimum, maximum, exclusiveMinimum, exclusiveMaximum, media.
XSD_FACETS: dict[str, dict] = {
    "string": {"type": "string"},
    "boolean": {"type": "boolean"},
    "dateTime": {"type": "string", "format": "date-time", "pattern": _P_DATETIME},
    "date": {"type": "string", "pattern": _P_DATE},
    "time": {"type": "string", "pattern": _P_TIME},
    "duration": {"type": "string", "pattern": _P_DURATION},
    "gYearMonth": {"type": "string", "pattern": _P_GYEARMONTH},
    "gYear": {"type": "string", "pattern": _P_GYEAR},
    "gMonthDay": {"type": "string", "pattern": _P_GMONTHDAY},
    "gDay": {"type": "string", "pattern": _P_GDAY},
    "gMonth": {"type": "string", "pattern": _P_GMONTH},
    "anyURI": {"type": "string", "format": "uri", "pattern": _P_ANYURI},
    "normalizedString": {"type": "string", "pattern": _P_NORMALIZED},
    "token": {"type": "string", "pattern": _P_TOKEN},
    "language": {"type": "string", "pattern": _P_LANGUAGE},
    "NMTOKEN": {"type": "string", "pattern": _P_NMTOKEN},
    "Name": {"type": "string", "pattern": _P_NAME},
    "NCName": {"type": "string", "pattern": _P_NCNAME},
    "base64Binary": {"type": "string", "pattern": _P_BASE64, "media": {"binaryEncoding": "base64"}},
    "hexBinary": {"type": "string", "pattern": _P_HEX, "media": {"binaryEncoding": "hex"}},
    "float": {"type": "number"},
    "double": {"type": "number"},
    "decimal": {"type": "number"},
    "integer": {"type": "integer"},
    "nonPositiveInteger": {"type": "integer", "maximum": 0},
    "negativeInteger": {"type": "integer", "maximum": 0, "exclusiveMaximum": True},
    "nonNegativeInteger": {"type": "integer", "minimum": 0},
    "positiveInteger": {"type": "integer", "minimum": 0, "exclusiveMinimum": True},
    "long": {"type": "integer", "minimum": I64_MIN, "maximum": I64_MAX},
    "int": {"type": "integer", "minimum": -2147483648, "maximum": 2147483647},
    "short": {"type": "integer", "minimum": -32768, "maximum": 32767},
    "byte": {"type": "integer", "minimum": -128, "maximum": 127},
    "unsignedLong": {"type": "integer", "minimum": 0, "maximum": 2**64 - 1},
    "unsignedInt": {"type": "integer", "minimum": 0, "maximum": 4294967295},
    # corrected: 65535, not the reference's 65536 (hardcoded-schemas.json:177)
    "unsignedShort": {"type": "integer", "minimum": 0, "maximum": 65535},
    "unsignedByte": {"type": "integer", "minimum": 0, "maximum": 255},
}

# Aliases the reference resolves through the same table (Text/Number/Float and
# the `xsd$`-prefixed badgerfish names, hardcoded-schemas.json:2-93).
_ALIASES = {"Text": "string", "Number": "number", "Float": "float", "Boolean": "boolean"}
XSD_FACETS["number"] = {"type": "number"}
for _k in list(XSD_FACETS):
    XSD_FACETS[f"xsd${_k}"] = XSD_FACETS[_k]
for _a, _t in _ALIASES.items():
    XSD_FACETS[_a] = XSD_FACETS[_t]

# format -> anchored pattern, for the `format` keyword (C4): table-driven rlike.
FORMAT_PATTERNS: dict[str, str] = {
    "date-time": _P_DATETIME,
    "date": _P_DATE,
    "time": _P_TIME,
    "uri": _P_ANYURI,
    "uri-reference": _P_ANYURI,
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "hostname": r"^[A-Za-z0-9](?:[A-Za-z0-9\-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9\-]{0,61}[A-Za-z0-9])?)*$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
}


def get_facets(name: str) -> dict | None:
    """Lookup like the reference's ``getHardcoded`` (lib/index.js:49-51)."""
    return XSD_FACETS.get(name)
