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


def test_scan_row_groups_short_circuits_on_file_count(tmp_path, monkeypatch):
    """A table with >= threshold parquet files must be classified 'wide'
    from the file count ALONE — zero footer reads (VERDICT r21 item 2:
    at 100 TB a fan-out table has thousands of files and a per-file
    driver-side footer scan is itself the scale hazard)."""
    import pyarrow.parquet as pq

    from thisishappening_spark.sources.tables import _scan_row_groups

    d = tmp_path / "many.parquet"
    d.mkdir()
    for i in range(8):
        (d / f"part-{i}.parquet").write_bytes(b"not read")

    def boom(*a, **k):
        raise AssertionError("footer read attempted despite file-count short-circuit")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    assert _scan_row_groups(str(d), threshold=8) == 8
    assert _scan_row_groups(str(d), threshold=3) == 3


def test_scan_row_groups_counts_nested_layouts(spark, sf_dir, tmp_path):
    """A partitioned/nested layout (files under subdirectories) must be
    counted recursively — r21's top-level listing returned 0 and fanned
    out a production-shaped input (ADVICE r21)."""
    from thisishappening_spark.sources.tables import _scan_row_groups

    base = load_table(spark, sf_dir, "documents")
    nested = tmp_path / "nested.parquet"
    base.limit(10).write.mode("overwrite").parquet(str(nested / "lang=en"))
    base.limit(10).write.mode("overwrite").parquet(str(nested / "lang=fr"))
    assert _scan_row_groups(str(nested), threshold=2) == 2


def test_scan_row_groups_noops_on_non_posix_paths():
    """Object-store URIs cannot be os.walk'ed: treat them as wide (no
    fan-out) instead of crashing or misfiring."""
    from thisishappening_spark.sources.tables import _scan_row_groups

    assert _scan_row_groups("s3://bucket/table.parquet", threshold=32) == 32
    assert _scan_row_groups("/no/such/path.parquet", threshold=32) == 32


def test_invalidate_relation_cache_picks_up_rewritten_data(spark, sf_dir, tmp_path):
    """The cache pins the file listing per path (catalog-like staleness,
    ADVICE r21); invalidate_relation_cache must make the next load re-list."""
    from thisishappening_spark.sources.tables import invalidate_relation_cache

    other = str(tmp_path / "sfMut")
    base = load_table(spark, sf_dir, "documents")
    base.limit(3).write.mode("overwrite").parquet(f"{other}/documents.parquet")
    first = load_table(spark, other, "documents")
    assert first.count() == 3

    base.limit(5).write.mode("overwrite").parquet(f"{other}/documents.parquet")
    invalidate_relation_cache(spark, other)
    fresh = load_table(spark, other, "documents")
    assert fresh is not first, "invalidate must drop the pinned relation"
    assert fresh.count() == 5
