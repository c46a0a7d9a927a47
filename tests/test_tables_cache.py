"""The session-scoped relation cache in sources/tables.py must reuse the
*relation* (file listing + schema — an unexecuted plan), never rows: every
action still scans the parquet input, and the Spark cache manager stays
empty. Guards against both a regression (per-call re-listing returning,
which costs 0.1-0.5 s of driver time per query) and against the cache ever
turning into a result cache (which the bench rules forbid)."""

from __future__ import annotations

from thisishappening_spark.sources.tables import _RELATION_CACHE, load_table


def test_load_table_reuses_relation_within_session(spark, sf_dir):
    a = load_table(spark, sf_dir, "documents")
    b = load_table(spark, sf_dir, "documents")
    assert a is b, "second load_table call must reuse the cached relation"


def test_load_table_keys_by_absolute_path(spark, sf_dir, tmp_path):
    other = str(tmp_path / "sfX")
    base = load_table(spark, sf_dir, "documents")
    base.limit(7).write.mode("overwrite").parquet(f"{other}/documents.parquet")
    alt = load_table(spark, other, "documents")
    assert alt is not base, "different sf_dir must resolve its own relation"
    assert alt.count() == 7

    # Re-point the same name at the same dir again: still the same relation.
    assert load_table(spark, sf_dir, "documents") is base


def test_relation_cache_holds_no_rows(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    df.collect()  # an action through the cached relation
    n_cached = spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    assert n_cached == 0, f"{n_cached} cached plans leaked — relation cache must not persist rows"
    assert any(spark is s for s in _RELATION_CACHE), "cache should be keyed by this session"


def test_fan_out_redistributes_narrow_scan_same_rows(spark, sf_dir):
    """The test tables are single-row-group parquet (scan parallelism 1);
    fan_out must add a round-robin exchange sized to defaultParallelism and
    change nothing about the rows."""
    base = load_table(spark, sf_dir, "documents")
    fanned = load_table(spark, sf_dir, "documents", fan_out=True)
    assert fanned is not base
    assert "RoundRobinPartitioning" in fanned._jdf.queryExecution().analyzed().toString() or (
        "Repartition" in fanned._jdf.queryExecution().analyzed().toString()
    )
    assert {tuple(r) for r in fanned.collect()} == {tuple(r) for r in base.collect()}
    # cached separately from the plain relation, and reused on re-call
    assert load_table(spark, sf_dir, "documents", fan_out=True) is fanned


def test_fan_out_is_noop_when_row_groups_cover_parallelism(spark, sf_dir, tmp_path):
    """A layout with >= defaultParallelism row groups must NOT be
    redistributed — the production (100 TB) case."""
    other = str(tmp_path / "sfRG")
    base = load_table(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    # many files => many row groups (>= one per file)
    base.repartition(n).write.mode("overwrite").parquet(f"{other}/documents.parquet")
    fanned = load_table(spark, other, "documents", fan_out=True)
    plan = fanned._jdf.queryExecution().analyzed().toString()
    assert "Repartition" not in plan, "wide layout must not be redistributed"
