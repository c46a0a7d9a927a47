"""LLM-data-pipeline operators: differential checks vs DuckDB plus
semantic unit tests (dup collapse, LSH recall) that the SQL oracle can't
express."""

from __future__ import annotations

import pytest

from tests.oracle import compare

DIFF_QUERIES = [
    "q_exact_dedup_groups",
    "q_ngram_jaccard_pairs",
    "q_minhash_lsh_pairs",
    "q_simhash",
    "q_cosine_topk",
    "q_doc_stats",
    "q_quality_filter",
    "q_lang_id_distribution",
    "q_doc_fingerprint",
]


@pytest.mark.parametrize("name", DIFF_QUERIES)
def test_differential(spark, sf_dir, name):
    compare(spark, sf_dir, name)


def test_exact_dedup_collapses_duplicates(spark):
    from thisishappening_spark.operators.dedup import exact_dedup, exact_dedup_groups

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "  the   QUICK brown\tfox "),  # same after normalize
            (3, "jumps over the lazy dog"),
            (4, "jumps over the lazy dog"),
            (5, "unique text"),
        ],
        "doc_id bigint, text string",
    )
    groups = {r["keep_doc_id"]: r["n_docs"] for r in exact_dedup_groups(docs).collect()}
    assert groups == {1: 2, 3: 2, 5: 1}
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [1, 3, 5]


def test_minhash_estimates_track_true_jaccard(spark, sf_dir):
    """LSH candidates at est≥0.5 should largely coincide with true
    Jaccard≥0.5 pairs (the generator's planted near-dups)."""
    from thisishappening_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from thisishappening_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    true_pairs = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    est = minhash_lsh_pairs(docs, hash_mode="xxhash64").collect()
    est_pairs = {(r["doc_a"], r["doc_b"]) for r in est if r["est_jaccard"] >= 0.5}
    assert true_pairs, "generator should plant near-dups"
    # LSH with 4 bands x 4 rows has ~99% recall at J>=0.7 and the planted
    # dups are mostly J>0.7; require high but not perfect overlap.
    recall = len(true_pairs & est_pairs) / len(true_pairs)
    assert recall >= 0.7, f"minhash recall too low: {recall} ({est_pairs} vs {true_pairs})"


def test_ann_lsh_recall(spark, sf_dir):
    from thisishappening_spark.operators.similarity import ann_lsh_topk, cosine_topk
    from thisishappening_spark.queries.llm import COSINE_QUERY_IDS
    from thisishappening_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, COSINE_QUERY_IDS, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(emb, COSINE_QUERY_IDS, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ann_rows_shape(spark, sf_dir):
    """q_ann_lsh_topk is the registry's rows-only entry; pin its schema."""
    from thisishappening_spark.queries import REGISTRY

    df = REGISTRY["q_ann_lsh_topk"].fn(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "query_id",
        "neighbor_id",
        "cos_sim",
        "rank",
    ]
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["rank"] <= 3 for r in rows)
