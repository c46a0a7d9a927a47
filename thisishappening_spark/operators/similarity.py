"""Similarity search over an embedding column (``array<float>``).

Two tiers, per the training-pipeline brief:

- **Brute-force cosine top-k** (the correctness baseline): queries are a
  small set, broadcast against the corpus; the dot product is a
  ``zip_with``/``aggregate`` column expression — whole-stage-codegen
  JVM-side, no Python, no explode. Per (query, candidate) pair the work is
  one fused array pass. The only shuffle is the final top-k aggregation,
  which moves k rows per query.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures put
  each vector into a bucket; only bucket-mates are scored. Candidate
  generation is an equi-join on the signature, so comparisons scale with
  bucket occupancy, not n². Hyperplanes come from a deterministic integer
  formula (no RNG state) so the operator is reproducible across runs and
  engines.

Determinism discipline (registry rules, registry.py): dot products and
norms quantize each double product to DECIMAL(28,15) and sum exactly, so
Spark and DuckDB agree bit-for-bit; the final cosine divides doubles whose
inputs are those exact decimals (sqrt and / are correctly rounded IEEE ops
→ identical across engines), then rounds to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic pseudo-random hyperplane component for plane p, dim i:
# frac((A*p + B*i + C) mod M / M) - 0.5  — a fixed LCG-style lattice, good
# enough to split directions into buckets and fully reproducible.
_HP_A = 48_271
_HP_B = 16_807
_HP_C = 12_345
_HP_M = 2_147_483_647


def as_double_vec(col: Column) -> Column:
    """array<float> → array<double> so arithmetic runs in IEEE double on
    every engine (float math widens differently between engines)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot_dec(a: Column, b: Column) -> Column:
    """Exact-decimal dot product: per-term quantize to DECIMAL(28,15), sum
    in DECIMAL(38,15) — order-independent and cross-engine exact."""
    terms = F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(28,15)"))
    # Re-cast each partial sum: Spark's decimal-add widening would otherwise
    # drift the accumulator type to DECIMAL(38,14). The cast is lossless here
    # (64 terms, each |t| < 10^13).
    return F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,15)"),
        lambda acc, t: (acc + t).cast("decimal(38,15)"),
    )


def norm2_dec(a: Column) -> Column:
    return dot_dec(a, a)


def cosine(dot: Column, n2a: Column, n2b: Column, round_to: int = 6) -> Column:
    return F.round(
        dot.cast("double")
        / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))),
        round_to,
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).

    Output: (query_id, neighbor_id, cos_sim, rank). Queries are broadcast
    (tiny side), so the corpus scan never shuffles; ranking uses
    row_number over (cos desc, neighbor_id) for a deterministic tie-break.
    """
    v = emb.select(
        F.col(id_col).alias("vid"), as_double_vec(F.col(vec_col)).alias("v")
    )
    norms = v.select("vid", "v", norm2_dec(F.col("v")).alias("n2"))
    q = norms.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    pairs = norms.join(F.broadcast(q), F.col("vid") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        cosine(
            dot_dec(F.col("qv"), F.col("v")), F.col("qn2"), F.col("n2")
        ).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature as a small integer: bit p is the
    sign of <v, h_p> with h_p a deterministic lattice direction.

    Pure column arithmetic (aggregate over the array), JVM-side.
    """
    bits = []
    for p in range(n_planes):
        comp = [
            ((_HP_A * p + _HP_B * i + _HP_C) % _HP_M) / _HP_M - 0.5
            for i in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in comp]),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(0))
    return sum(bits).cast("int")


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only candidates whose hyperplane bucket is
    within ``multiprobe_hamming`` bits of the query's bucket (multi-probe
    LSH), then exact-rerank with the same cosine as the brute-force path.

    The candidate join is an equi-join on the probed bucket id, so at
    corpus scale the cost is (buckets probed × bucket occupancy), not n².
    Recall is tunable via n_planes / multiprobe_hamming; the pytest
    harness measures it against :func:`cosine_topk`.
    """
    v = emb.select(
        F.col(id_col).alias("vid"), as_double_vec(F.col(vec_col)).alias("v")
    )
    sig = v.select(
        "vid", "v", hyperplane_signature(F.col("v"), n_planes, dim).alias("bucket")
    )
    norms = sig.select("vid", "v", "bucket", norm2_dec(F.col("v")).alias("n2"))

    # Probe set: the query's own bucket plus all buckets within the allowed
    # Hamming radius (r=1 → n_planes+1 probes).
    probes = [F.col("bucket")]
    if multiprobe_hamming >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    q = (
        norms.filter(F.col("vid").isin(query_ids))
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("n2").alias("qn2"),
            F.explode(F.array(*probes)).alias("probe_bucket"),
        )
    )
    cand = norms.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe_bucket"))
        & (F.col("vid") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        cosine(
            dot_dec(F.col("qv"), F.col("v")), F.col("qn2"), F.col("n2")
        ).alias("cos_sim"),
    ).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
