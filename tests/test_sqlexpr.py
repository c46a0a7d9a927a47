"""Focused tests for the r21 SQL-expression-string helpers (sqlexpr.py).

The whole point of the string convention is that a rendered literal must
parse back to the exact expression the Column form built — same value AND
same type (a type drift would silently change comparison coercions and
break oracle hash-equality). Pin both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thisishappening_spark.sqlexpr import flit, sql_str


@pytest.mark.parametrize(
    "s",
    [
        "plain",
        "it's",
        "back\\slash",
        r"\berror\b",  # regex fragment used by admission's RLIKE patterns
        "(?i)(buy now|click here)",
        "mixed '\\' quote",
        "",
    ],
)
def test_sql_str_round_trips_exactly(spark, s):
    got = spark.range(1).select(F.expr(sql_str(s)).alias("v")).collect()[0].v
    assert got == s


@pytest.mark.parametrize("x", [0.0, 1.0, -71.15, 42.3601, 1e-9, -0.25])
def test_flit_is_double_typed_and_exact(spark, x):
    df = spark.range(1).select(F.expr(flit(x)).alias("v"))
    assert df.schema["v"].dataType.simpleString() == "double"
    assert df.collect()[0].v == x


def test_flit_differs_from_bare_literal_typing(spark):
    # A bare decimal literal parses as DECIMAL — exactly the drift flit
    # exists to prevent.
    bare = spark.range(1).select(F.expr("-71.15").alias("v"))
    assert bare.schema["v"].dataType.simpleString().startswith("decimal")
