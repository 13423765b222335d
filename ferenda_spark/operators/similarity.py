"""Similarity search over the `embeddings` table (array<float>).

Training-data-pipeline ANN operators (driver mandate):

* :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  set, JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no
  Python in the hot path), per-query top-k via window.  At 100 TB the
  query side stays broadcast-sized and the corpus side streams — one
  scan, no shuffle except the final per-query top-k.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane-free
  deterministic LSH (sign of dot with seeded pseudo-random vectors is
  not SQL-reproducible, so buckets use coarse quantization of leading
  PCA-free dimensions: sign bits of the first b dims).  Candidates =
  same-bucket (plus Hamming-1 neighbor buckets optional); exact rescore
  within candidates.  Trades recall for a bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(pairs: DataFrame, a_col: str = "query_vec",
                b_col: str = "embedding") -> DataFrame:
    a = F.transform(F.col(a_col), lambda x: x.cast("double"))
    b = F.transform(F.col(b_col), lambda x: x.cast("double"))
    return pairs.withColumn(
        "cosine", _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(embeddings: DataFrame, query_ids: list[int],
                k: int = 5, round_to: int = 6) -> DataFrame:
    """Exact top-k neighbours for each query vec_id (excluding self).
    Returns (query_id, vec_id, rank, cosine_r) with cosine rounded for
    cross-engine float stability."""
    q = (embeddings
         .where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    pairs = embeddings.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id"))
    scored = (with_cosine(pairs)
              .withColumn("cosine_r", F.round("cosine", round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine_r"))


def sign_bucket(vec_col, n_bits: int = 8):
    """Deterministic coarse LSH bucket: sign bits of the first n dims.
    Unrolled fixed-width sum (stays in whole-stage codegen; shiftleft
    needs a literal shift so a lambda over indices can't express it)."""
    expr = F.lit(0).cast("long")
    for i in range(n_bits):
        expr = expr + (F.when(F.element_at(vec_col, i + 1) > 0,
                              F.lit(1 << i)).otherwise(F.lit(0))
                       .cast("long"))
    return expr


def lsh_bucketed_topk(embeddings: DataFrame, query_ids: list[int],
                      k: int = 5, n_bits: int = 8,
                      round_to: int = 6) -> DataFrame:
    """ANN: candidates restricted to the query's sign bucket, exact
    cosine rescore within.  Recall < 1 by construction; the benchmark
    reports both paths."""
    e = embeddings.withColumn("bucket", sign_bucket(F.col("embedding"),
                                                    n_bits))
    q = (e.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec"),
                 F.col("bucket").alias("qbucket")))
    pairs = (e.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
             .where(F.col("vec_id") != F.col("query_id")))
    scored = (with_cosine(pairs)
              .withColumn("cosine_r", F.round("cosine", round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine_r"))


def embedding_near_dupes(embeddings: DataFrame, threshold: float = 0.9,
                         n_bits: int = 8, round_to: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup,
    driver mandate): candidates blocked by the deterministic sign
    bucket, exact cosine rescore, pairs above ``threshold``.

    Scale shape: the self-join shuffles on the bucket key only —
    each bucket's candidate set is a tiny fraction of the corpus
    (2^n_bits buckets), so the quadratic blowup of an unblocked
    self-join never materializes; skewed buckets are split by AQE.
    Returns (vec_a, vec_b, cosine_r) with vec_a < vec_b.
    """
    e = embeddings.select(
        "vec_id", "embedding",
        sign_bucket(F.col("embedding"), n_bits).alias("bucket"))
    a = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("vec_a_emb"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("vec_b_emb"), "bucket")
    pairs = (a.join(b, "bucket")
             .where(F.col("vec_a") < F.col("vec_b")))
    scored = (with_cosine(pairs, "vec_a_emb", "vec_b_emb")
              .withColumn("cosine_r", F.round("cosine", round_to)))
    return (scored.where(F.col("cosine_r") >= threshold)
            .select("vec_a", "vec_b", "cosine_r"))
