"""Exhaustive lexical/range parity over the ported XSD facet table.

The reference's sole type authority is hardcoded-schemas.json (~57 entries,
consumed via getHardcoded at lib/index.js:49-51). xsd_facets.py ports it as
data; this test drives EVERY pattern- or range-carrying entry through the
compiled predicate with accept + reject samples from the XSD lexical spaces —
including the documented corrections (unsignedShort max 65535, exact int64
long bounds).
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from owl2jsonschema_js_spark.compile import compile_schema
from owl2jsonschema_js_spark.spec import ConstraintSpec
from owl2jsonschema_js_spark.xsd_facets import XSD_FACETS

# facet -> (accepted samples, rejected samples)
STRING_SAMPLES = {
    "dateTime": (["2023-01-02T03:04:05Z", "2023-01-02T03:04:05.123+05:30"],
                 ["2023-13-02T03:04:05", "20230102", "2023-01-02 03:04:05"]),
    "date": (["2023-01-02", "-0456-12-31Z"], ["2023-1-2", "2023-00-01"]),
    "time": (["23:59:59", "00:00:00.5Z"], ["24:00:00", "12:60:00"]),
    "duration": (["P1Y2M3DT4H5M6S", "PT0.5S", "-P7D"], ["P", "1Y"]),
    "gYearMonth": (["2023-07"], ["2023-13", "202307"]),
    "gYear": (["2023", "-0042", "2023Z"], ["023", "2023-07"]),
    "gMonthDay": (["--07-15"], ["--13-01", "07-15"]),
    "gDay": (["---09", "---31"], ["---32", "09"]),
    "gMonth": (["--11"], ["--13", "11"]),
    "anyURI": (["http://example.com/a?b#c", "mailto:x@y", "rel/path"],
               ["http://exa mple.com", "a b"]),
    "normalizedString": (["abc def", ""], ["a\tb", "a\nb"]),
    "token": (["a b c", ""], [" a", "a ", "a  b"]),
    "language": (["en", "en-US", "x-klingon1"], ["abcdefghi", "en_US"]),
    "NMTOKEN": (["a-b.c:d", "123"], ["a b", ""]),
    "Name": ([":root", "_x1", "a.b"], ["1abc", ""]),
    "NCName": (["_x1", "a.b-c"], ["a:b", "1a"]),
    "base64Binary": (["TWFu", "TWE=", "TQ==", ""], ["TWFu=", "T@=="]),
    "hexBinary": (["0fA9", ""], ["0f9", "0g"]),
}

INT_SAMPLES = {
    "nonPositiveInteger": ([0, -5], [1]),
    "negativeInteger": ([-1], [0]),
    "nonNegativeInteger": ([0, 7], [-1]),
    "positiveInteger": ([1], [0, -1]),
    "long": ([-(2**63), 2**63 - 1], []),
    "int": ([2147483647, -2147483648], [2147483648, -2147483649]),
    "short": ([32767, -32768], [32768, -32769]),
    "byte": ([127, -128], [128, -129]),
    "unsignedInt": ([0, 4294967295], [4294967296, -1]),
    # the corrected off-by-one: reference says 65536 (hardcoded-schemas.json:177)
    "unsignedShort": ([65535], [65536, -1]),
    "unsignedByte": ([255], [256, -1]),
}


def _eval(spark, samples, dtype, spark_type):
    """One job: (facet, value, expect) rows; predicate dispatched per facet."""
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    rows = [(name, v, True) for name, (acc, _) in samples.items() for v in acc]
    rows += [(name, v, False) for name, (_, rej) in samples.items() for v in rej]
    df = spark.createDataFrame(rows, T.StructType([
        T.StructField("facet", T.StringType()),
        T.StructField("value", spark_type),
        T.StructField("expect", T.BooleanType()),
    ]))
    chain = F.lit(None).cast("boolean")
    for name in samples:
        facet = {k: v for k, v in XSD_FACETS[name].items() if k != "media"}
        p = F.coalesce(compile_schema(facet, F.col("value"), spark_type, spec),
                       F.lit(False))
        chain = F.when(F.col("facet") == name, p).otherwise(chain)
    bad = df.where(chain != F.col("expect")).collect()
    assert not bad, [(r["facet"], r["value"], r["expect"]) for r in bad]


def test_string_facets_lexical_parity(spark):
    assert set(STRING_SAMPLES) <= set(XSD_FACETS)
    _eval(spark, STRING_SAMPLES, "string", T.StringType())


def test_integer_facets_range_parity(spark):
    assert set(INT_SAMPLES) <= set(XSD_FACETS)
    _eval(spark, INT_SAMPLES, "long", T.LongType())


def test_every_facet_compiles(spark):
    """No entry in the ported table may crash the compiler (including aliases
    and the xsd$-prefixed badgerfish names)."""
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    for name, facet in XSD_FACETS.items():
        facet = {k: v for k, v in facet.items() if k != "media"}
        col_type = {"integer": T.LongType(), "number": T.DoubleType(),
                    "boolean": T.BooleanType()}.get(facet.get("type"), T.StringType())
        compile_schema(facet, F.col("v"), col_type, spec)


def test_unsigned_long_exact_bounds(spark):
    """uint64 max exceeds int64 — the engine evaluates it via decimal
    comparison, exactly (the reference loses these bounds to JS float,
    hardcoded-schemas.json:128-129)."""
    spec = ConstraintSpec.parse({"type": "object", "properties": {}})
    facet = {k: v for k, v in XSD_FACETS["unsignedLong"].items() if k != "media"}
    df = spark.createDataFrame(
        [(0,), (2**63 - 1,), (-1,)],
        T.StructType([T.StructField("v", T.LongType())]))
    pred = F.coalesce(
        compile_schema(facet, F.col("v").cast("decimal(22,0)"),
                       T.DecimalType(22, 0), spec), F.lit(False))
    got = [r[0] for r in df.select(pred).collect()]
    assert got == [True, True, False]
