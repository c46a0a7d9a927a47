"""Differential test: every registry query with an oracle must match DuckDB.

This mirrors the driver's CORRECTNESS gate (sf0.01); tests default to
sf0.001 for speed — set SPARK_GRAFT_TEST_SF_DIR to widen.
"""

from __future__ import annotations

import pytest

from thisishappening_spark.queries import REGISTRY

from tests.oracle import compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    compare(spark, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
