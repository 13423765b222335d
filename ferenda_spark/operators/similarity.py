"""Similarity search over the `embeddings` table (array<float>).

Training-data-pipeline ANN operators (driver mandate):

* :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  set, JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no
  Python in the hot path), per-query top-k via window.  At 100 TB the
  query side stays broadcast-sized and the corpus side streams — one
  scan, no shuffle except the final per-query top-k.
* :func:`ivf_topk` — the IVF scale path: a deterministic Lloyd's
  k-means coarse quantizer (:func:`ivf_centroids`, driver-held model
  parameter), map-side nearest-list assignment, per-query nprobe
  nearest inverted lists, exact rescore within probed lists.
* :func:`lsh_bucketed_topk` — the LSH scale path: random-hyperplane-free
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


def sign_bucket(vec_col, n_bits: int = 8, offset: int = 0):
    """Deterministic coarse LSH bucket: sign bits of dims
    [offset+1 .. offset+n_bits].  Unrolled fixed-width sum (stays in
    whole-stage codegen; shiftleft needs a literal shift so a lambda
    over indices can't express it)."""
    expr = F.lit(0).cast("long")
    for i in range(n_bits):
        expr = expr + (F.when(F.element_at(vec_col, offset + i + 1) > 0,
                              F.lit(1 << i)).otherwise(F.lit(0))
                       .cast("long"))
    return expr


def sign_bucket_bands(vec_col, bits_per_band: int = 16, n_bands: int = 4):
    """Array of (band, bucket) structs: band t = the sign bits of dims
    [t*b+1 .. (t+1)*b] — the OR-construction over ``n_bands``
    independent sign-LSH tables (same shape as minhash banding).  A
    pair is a candidate if it collides in ANY band, so recall no longer
    collapses when a single bucket table gets fine-grained: with
    per-bit agree probability p = 1 - theta/pi, candidate recall is
    1-(1-p^b)^n_bands instead of p^b.  Requires
    ``bits_per_band * n_bands <= dim(vec)``."""
    structs = []
    for t in range(n_bands):
        structs.append(F.struct(
            F.lit(t).alias("band"),
            sign_bucket(vec_col, bits_per_band,
                        offset=t * bits_per_band).alias("bucket")))
    return F.array(*structs)


def _banded(embeddings: DataFrame, bits_per_band: int, n_bands: int):
    """(vec_id, band, bucket) rows — n_bands rows per vector, all
    map-side."""
    return (embeddings
            .select("vec_id",
                    F.explode(sign_bucket_bands(
                        F.col("embedding"), bits_per_band, n_bands))
                    .alias("bb"))
            .select("vec_id", "bb.band", "bb.bucket"))


def lsh_bucketed_topk(embeddings: DataFrame, query_ids: list[int],
                      k: int = 5, bits_per_band: int = 8,
                      n_bands: int = 4, round_to: int = 6) -> DataFrame:
    """ANN: candidates = vectors sharing ANY band bucket with the
    query (banded OR-construction), exact cosine rescore within.
    Recall < 1 by construction; the benchmark reports both paths.

    Scale shape: the band table is a map-side expression; the
    candidate join is against the broadcast query-side band table;
    candidate ids are deduped BEFORE the embedding re-join so each
    candidate is rescored once."""
    b = _banded(embeddings, bits_per_band, n_bands)
    qb = (b.where(F.col("vec_id").isin(query_ids))
          .select(F.col("vec_id").alias("query_id"), "band", "bucket"))
    cand = (b.join(F.broadcast(qb), ["band", "bucket"])
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
            .distinct())
    q_vecs = (embeddings.where(F.col("vec_id").isin(query_ids))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("query_vec")))
    pairs = (cand.join(embeddings, "vec_id")
             .join(F.broadcast(q_vecs), "query_id"))
    scored = (with_cosine(pairs)
              .withColumn("cosine_r", F.round("cosine", round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine_r"))


def embedding_near_dupes(embeddings: DataFrame, threshold: float = 0.9,
                         bits_per_band: int = 16, n_bands: int = 4,
                         round_to: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup,
    driver mandate): candidates blocked by banded sign-LSH buckets
    (OR-construction), exact cosine rescore, pairs above ``threshold``.

    Scale shape (10^12 rows): each band has 2^bits_per_band buckets —
    at 16 bits that is 65k buckets/band, mean occupancy ~1.5e7 at
    10^12 rows, and occupancy is what bounds the per-bucket self-join;
    r1's single 8-bit table (256 buckets) left ~4e9 rows per bucket,
    still quadratic.  Recall lost to the finer buckets is recovered by
    the OR over bands (collide in ANY band -> candidate).  Candidate
    pairs are deduped across bands BEFORE the embedding re-join, so
    each surviving pair is rescored exactly once and the wide float
    arrays never travel through the band shuffle.  Skewed buckets
    (e.g. the all-positive orthant) are split by AQE skew-join.
    Returns (vec_a, vec_b, cosine_r) with vec_a < vec_b.
    """
    b = _banded(embeddings, bits_per_band, n_bands)
    a = b.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    bb = b.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    cand = (a.join(bb, ["band", "bucket"])
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .distinct())
    ea = embeddings.select(F.col("vec_id").alias("vec_a"),
                           F.col("embedding").alias("vec_a_emb"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"),
                           F.col("embedding").alias("vec_b_emb"))
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
    scored = (with_cosine(pairs, "vec_a_emb", "vec_b_emb")
              .withColumn("cosine_r", F.round("cosine", round_to)))
    return (scored.where(F.col("cosine_r") >= threshold)
            .select("vec_a", "vec_b", "cosine_r"))


# ------------------------------------------------------------------ IVF

def _centroid_dist_structs(vec_col, centroids):
    """Array of (dist, cl) structs — negative cosine against each
    driver-held centroid, all literals, so assignment stays inside
    whole-stage codegen (no shuffle, no UDF).  Centroids are a bounded
    model parameter (n_lists x dim floats), the same role as any
    broadcast trained model."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    nv = _norm(v)
    structs = []
    for cl, cent in enumerate(centroids):
        c = F.array(*[F.lit(float(x)) for x in cent])
        structs.append(F.struct(
            (-_dot(v, c) / (nv * _norm(c))).alias("dist"),
            F.lit(cl).alias("cl")))
    return F.array(*structs)


def assign_lists(embeddings: DataFrame, centroids,
                 vec_col: str = "embedding") -> DataFrame:
    """+ ``cl`` column: index of the nearest centroid (cosine),
    map-side (array_min over the literal centroid set; ties break to
    the lowest cluster id via the struct's (dist, cl) ordering)."""
    return embeddings.withColumn(
        "cl", F.array_min(_centroid_dist_structs(
            F.col(vec_col), centroids))["cl"])


def ivf_centroids(embeddings: DataFrame, n_lists: int = 8,
                  iters: int = 3, sample_mod: int = 1) -> list:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    * init: the min-vec_id vector of each residue class
      ``xxhash64(vec_id) % n_lists`` — deterministic, spread across
      the id space regardless of id patterns, ONE hash aggregate (a
      rank-stride init would need a global row_number window: a
      single task sorting the whole training set — the exact
      antipattern this module avoids elsewhere);
    * assign: map-side argmin against the current centroid literals;
    * update: posexplode -> groupBy(cl, pos).avg — ONE shuffle of
      N*dim scalar rows per iteration, map-side partial aggregation;
      the C x dim result is driver-held (a model parameter, not data).

    At 10^12 rows the training set must be a sample — ``sample_mod``
    trains on vec_id % sample_mod == 0 (deterministic, no RNG); the
    full-table pass is only the final assignment.  Empty clusters keep
    their previous centroid (standard Lloyd fallback)."""
    train = embeddings
    if sample_mod > 1:
        train = train.where(F.col("vec_id") % sample_mod == 0)
    train = train.select("vec_id", "embedding").localCheckpoint()
    n = train.count()
    if n == 0:
        raise ValueError("no training vectors")
    n_lists = min(n_lists, n)
    # hash the id before the residue so id patterns (e.g. the
    # sample_mod stride itself) can't collapse classes
    init = (train
            .withColumn("res", F.pmod(F.xxhash64("vec_id"),
                                      F.lit(n_lists)))
            .groupBy("res")
            .agg(F.min_by("embedding", "vec_id").alias("embedding"))
            .orderBy("res").select("embedding").collect())
    centroids = [list(map(float, r.embedding)) for r in init]
    for _ in range(iters):
        assigned = assign_lists(train, centroids)
        means = (assigned
                 .select("cl", F.posexplode(F.col("embedding")
                                            .cast("array<double>"))
                         .alias("pos", "val"))
                 .groupBy("cl", "pos").agg(F.avg("val").alias("m"))
                 .collect())
        by_cl: dict = {}
        for r in means:
            by_cl.setdefault(r.cl, {})[r.pos] = r.m
        centroids = [
            [by_cl[cl][p] for p in range(len(centroids[cl]))]
            if cl in by_cl else centroids[cl]
            for cl in range(len(centroids))]
    return centroids


def clustered_embeddings(ids: DataFrame, n_clusters: int = 4,
                         dim: int = 8) -> DataFrame:
    """Closed-form well-separated clustered corpus over an existing
    id set: vector i = e_c + eps*e_{n_clusters+c} with c = i %
    n_clusters and eps = (i % 7) * 0.01.  Cross-cluster cosine is
    EXACTLY 0 (disjoint support) and within-cluster cosine > 0.99, so
    for these vectors IVF with the true one-hot centroids and ANY
    nprobe >= 1 provably returns the exact brute-force top-k — the
    corpus that lets the driver oracle pin the pruned (nprobe <
    n_lists) branch, not just the probe-everything one.  All JVM-side
    (transform over a sequence literal)."""
    d = F.col("vec_id")
    c, eps = d % n_clusters, (d % 7) * F.lit(0.01)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(j == c, F.lit(1.0))
                   .when(j == F.lit(n_clusters) + c, eps)
                   .otherwise(F.lit(0.0)))
    return ids.select("vec_id", vec.alias("embedding"))


def one_hot_centroids(n_clusters: int = 4, dim: int = 8) -> list:
    """The true centroids of :func:`clustered_embeddings` — the
    offline-trained quantizer a production IVF index would load."""
    return [[1.0 if j == c else 0.0 for j in range(dim)]
            for c in range(n_clusters)]


SEMDEDUP_TILTS = (0.0, 0.25, 0.5, 1.0, 2.0)


def semdedup_embeddings(ids: DataFrame, n_clusters: int = 4,
                        dim: int = 8) -> DataFrame:
    """Closed-form corpus with GRADED within-cluster similarity (the
    all->0.99 corpus of :func:`clustered_embeddings` would make every
    threshold degenerate): vector i = e_c + t*e_{n_clusters+c} with
    c = i % n_clusters and tilt t = SEMDEDUP_TILTS[(i div n_clusters)
    % 5].  Within a cluster, cos(i, j) = (1 + t_i*t_j) /
    (sqrt(1+t_i^2)*sqrt(1+t_j^2)) — exact rational/sqrt algebra both
    engines evaluate identically at 6-decimal rounding — taking values
    {1.0, 0.976187, 0.970143, 0.948683, ...}, so a 0.96 threshold
    splits each cluster into the {0, 0.25, 0.5} tilt chain plus two
    singleton-tilt groups; cross-cluster cosine is exactly 0."""
    c = F.col("vec_id") % n_clusters
    t = F.element_at(
        F.array(*[F.lit(x) for x in SEMDEDUP_TILTS]),
        (F.expr(f"vec_id div {int(n_clusters)}") % len(SEMDEDUP_TILTS)
         ).cast("int") + 1)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(j == c, F.lit(1.0))
                   .when(j == F.lit(n_clusters) + c, t)
                   .otherwise(F.lit(0.0)))
    return ids.select("vec_id", vec.alias("embedding"))


def semantic_dedup(embeddings: DataFrame, centroids,
                   threshold: float = 0.96,
                   round_to: int = 6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication with candidate generation bounded by a k-means
    coarse quantizer instead of LSH bands — assign every vector to its
    nearest centroid (map-side, the IVF assignment), form candidate
    pairs ONLY within a cluster, keep pairs with cosine >= threshold,
    take connected components, and within each duplicate component
    keep the member with the LOWEST cosine to its own centroid (the
    paper's keep-the-outlier rule: centroid-near members are the
    redundant ones), ties to the lowest id.

    Returns (vec_id, cl, centroid_cos_r, component_id, keep) for every
    input vector: component_id = min vec_id of its duplicate component
    (itself if never paired), keep = survives dedup.

    Scale shape (10^12 rows): assignment is a pure projection against
    the driver-held centroid literals; the only quadratic work is the
    per-cluster self-join, bounded by cluster occupancy (SemDeDup runs
    with k large enough that N/k is join-sized; skewed clusters split
    by AQE skew-join exactly like hot LSH buckets); the component
    fixpoint runs on above-threshold pairs only; the keep rule is one
    bounded per-component window.  Reference analogue: the sameAs
    keep-one canonicalization (SURVEY.md T11) applied to embedding
    space."""
    structs = _centroid_dist_structs(F.col("embedding"), centroids)
    best = F.array_min(structs)
    assigned = embeddings.select(
        "vec_id", "embedding", best["cl"].alias("cl"),
        F.round(-best["dist"], round_to).alias("centroid_cos_r"))
    a = assigned.select("cl", F.col("vec_id").alias("vec_a"),
                        F.col("embedding").alias("vec_a_emb"))
    b = assigned.select("cl", F.col("vec_id").alias("vec_b"),
                        F.col("embedding").alias("vec_b_emb"))
    pairs = (a.join(b, "cl")
             .where(F.col("vec_a") < F.col("vec_b")))
    dup = (with_cosine(pairs, "vec_a_emb", "vec_b_emb")
           .where(F.round("cosine", round_to) >= threshold)
           .select("vec_a", "vec_b"))
    from .dedup import dup_clusters
    comp = dup_clusters(dup, id_a="vec_a", id_b="vec_b").select(
        F.col("doc_id").alias("vec_id"),
        F.col("canonical_doc_id").alias("component_id"))
    out = (assigned.drop("embedding")
           .join(comp, "vec_id", "left")
           .withColumn("component_id",
                       F.coalesce("component_id", "vec_id")))
    w = Window.partitionBy("component_id")
    keeper = F.min(F.struct("centroid_cos_r", "vec_id")).over(w)
    return (out
            .withColumn("keep", keeper["vec_id"] == F.col("vec_id"))
            .select("vec_id", "cl", "centroid_cos_r",
                    "component_id", "keep"))


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             n_lists: int = 8, nprobe: int | None = None,
             iters: int = 3, sample_mod: int = 1,
             round_to: int = 6, centroids: list | None = None) -> DataFrame:
    """IVF ANN: corpus vectors are bucketed by nearest centroid
    (map-side), each query probes its ``nprobe`` nearest inverted
    lists, candidates are exactly rescored within those lists.

    Scale shape: assignment is a pure projection (no shuffle); the
    candidate join is corpus ⋈ broadcast(query-probe table) on ``cl``
    — the corpus side streams, only list-members of probed clusters
    are rescored, and the final per-query top-k is the single window
    shuffle.  ``nprobe = n_lists`` probes everything and returns the
    exact answer (the correctness oracle); smaller nprobe trades
    recall for a ~nprobe/n_lists candidate fraction (recall pinned by
    test_similarity recall test)."""
    if nprobe is None:
        nprobe = max(1, n_lists // 4)
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_lists, iters, sample_mod)
    nprobe = min(nprobe, len(centroids))
    assigned = assign_lists(embeddings, centroids)
    q = (embeddings.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    # nprobe nearest lists per query: sort the literal centroid
    # distances, slice, explode — still map-side
    probes = (q.withColumn(
        "cl", F.explode(F.transform(
            F.slice(F.array_sort(_centroid_dist_structs(
                F.col("query_vec"), centroids)), 1, nprobe),
            lambda s: s["cl"]))))
    pairs = (assigned.join(F.broadcast(probes), "cl")
             .where(F.col("vec_id") != F.col("query_id")))
    scored = (with_cosine(pairs)
              .withColumn("cosine_r", F.round("cosine", round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine_r"))


def sq8_quantize(embeddings: DataFrame, dim: int,
                 levels: int = 256) -> DataFrame:
    """FAISS-style SQ8 scalar quantization: per-dimension min/max
    "training" (one aggregate pass — min/max are order-independent,
    so unlike k-means means they are EXACTLY reproducible in any
    engine), then code_d = clamp(floor((x_d - min_d) / span_d *
    levels), levels-1) — an int8 per dimension, 4x smaller than
    float32 (at 100 TB of embeddings the rescore scan reads a quarter
    of the bytes).  Constant dimensions (span 0) code to 0.

    Returns (vec_id, codes: array<int>) plus a broadcast-sized bounds
    frame accessible via the returned DataFrame's ``mn``/``span``
    columns (kept inline so downstream dequantization needs no second
    join)."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mins = [F.min(F.element_at(e, i + 1)).alias(f"_mn{i}")
            for i in range(dim)]
    maxs = [F.max(F.element_at(e, i + 1)).alias(f"_mx{i}")
            for i in range(dim)]
    bounds = (embeddings.agg(*(mins + maxs))
              .select(F.array(*[F.col(f"_mn{i}") for i in range(dim)])
                      .alias("mn"),
                      F.array(*[F.col(f"_mx{i}") - F.col(f"_mn{i}")
                                for i in range(dim)]).alias("span")))
    lv = F.lit(float(levels))
    with_b = embeddings.crossJoin(F.broadcast(bounds))
    diff = F.zip_with(e, F.col("mn"), lambda x, m: x - m)
    code = F.zip_with(
        diff, F.col("span"),
        lambda d, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.least(F.lit(levels - 1),
                    F.floor(d / s * lv).cast("int"))).cast("int"))
    return with_b.select("vec_id", code.alias("codes"), "mn", "span")


def sq8_topk(embeddings: DataFrame, query_ids: list[int], dim: int,
             k: int = 5, levels: int = 256,
             round_to: int = 6) -> DataFrame:
    """ANN over SQ8-quantized vectors, asymmetric-distance style: the
    corpus side is dequantized from its int8 codes (x̂_d = min_d +
    (code_d + 0.5) * span_d / levels — bin midpoint), the query side
    stays exact float, cosine(query, x̂) ranks per-query top-k.

    Scale shape: training = ONE map-side-partial aggregate to a
    single row (no shuffle of vectors); quantization and
    dequantization are pure projections; the only shuffle is the
    per-query top-k window over the broadcast-query candidate join —
    identical to the exact brute-force plan but scanning 4x fewer
    bytes, the standard memory/IO trade the SQ8 index makes.

    Returns (query_id, vec_id, rank, cosine_sq_r)."""
    q = (embeddings.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("query_id"),
                 F.transform("embedding", lambda x: x.cast("double"))
                 .alias("query_vec")))
    codes = sq8_quantize(embeddings, dim, levels)
    lv = F.lit(float(levels))
    xhat = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(F.col("mn"), i + 1)
        + (c.cast("double") + 0.5)
        * F.element_at(F.col("span"), i + 1) / lv)
    deq = codes.select("vec_id", xhat.alias("embedding"))
    pairs = (deq.crossJoin(F.broadcast(q))
             .where(F.col("vec_id") != F.col("query_id")))
    scored = with_cosine(pairs, "query_vec", "embedding").withColumn(
        "cosine_sq_r", F.round("cosine", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sq_r").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine_sq_r"))


def centroid_distances(embeddings: DataFrame,
                       label_col: str = "label") -> DataFrame:
    """Per-cluster embedding hygiene: the element-wise mean centroid
    of each label group, every vector's L2 norm, and its distance to
    its group centroid — the outlier signal a pipeline inspects
    before trusting labels/clusters (mislabeled or corrupt vectors
    sit far from their centroid).

    Float discipline: both the norm and the distance are ORDERED
    left-to-right folds over the dimension axis (identical
    instruction sequence in Spark's F.aggregate and the oracle's
    list_reduce); the only shuffle-order-dependent float is the
    per-(label, dim) mean, which is rounded to 6 AT THE AGGREGATE
    (before it feeds the distance fold) like every cross-engine
    double.

    Scale shape: the centroid is one groupBy over (label, dim) rows
    (dimension x labels output — tiny) rebuilt into arrays and
    broadcast back; norms/distances are map-side folds.  Vectors
    shuffle once, as (label, dim, value) triples.

    Returns (vec_id, label, l2_norm, centroid_dist) rounded to 6."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = embeddings.select("vec_id", F.col(label_col).alias("label"),
                             v.alias("v"))
    pos = base.select("label", F.posexplode("v").alias("pos", "x"))
    # round the mean WHERE the order-dependent float is produced
    # (shuffle-order partial sums), like every cross-engine double
    cent = (pos.groupBy("label", "pos")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
                 .alias("pc"))
            .select("label",
                    F.transform("pc", lambda s: s.c).alias("cvec")))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0),
                                   lambda acc, x: acc + x)
    norm = F.sqrt(fold(F.transform(F.col("v"), lambda a: a * a)))
    dist = F.sqrt(fold(F.zip_with(
        F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b))))
    return (base.join(F.broadcast(cent), "label")
            .select("vec_id", "label",
                    F.round(norm, 6).alias("l2_norm"),
                    F.round(dist, 6).alias("centroid_dist")))


def pq_sample_codebooks(embeddings: DataFrame, m: int, k: int,
                        dim: int) -> list:
    """Product-quantizer codebooks with sampled-point initialization:
    codeword j of subspace s = dims [s*d0 .. (s+1)*d0) of the training
    vector ``vec_id = j*37 + 5`` — k-means with zero Lloyd rounds, the
    standard PQ bootstrap (Jégou et al. 2011 §III trains by k-means
    from a sample; the sampled-point init IS the k=0 member of that
    family, and :func:`ivf_centroids`'s Lloyd loop applies per
    subspace unchanged when refinement is wanted — pytest covers the
    refined path, the fixed init keeps the codebook a driver-held
    literal both engines replay exactly).

    Returns ``codebooks[s][j] = [d0 floats]`` — an m*k*d0 model
    parameter (for m=16,k=8,d0=4: 512 doubles), collected once."""
    ids = [j * 37 + 5 for j in range(k)]
    d0 = dim // m
    rows = (embeddings.where(F.col("vec_id").isin(ids))
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("v")).collect())
    by_id = {r.vec_id: list(r.v) for r in rows}
    if len(by_id) < k:
        raise ValueError("codebook training ids missing from corpus")
    return [[by_id[ids[j]][s * d0:(s + 1) * d0] for j in range(k)]
            for s in range(m)]


def pq_codes(embeddings: DataFrame, codebooks: list) -> DataFrame:
    """Map-side PQ encoding: (vec_id, codes array<int>) where
    codes[s] = argmin_j ||x_s - codebooks[s][j]||^2 (squared L2
    rounded to 6 for cross-engine argmin stability, ties to the lowest
    codeword index).  At 100 TB this is a pure projection — the code
    table is m*ceil(log2 k) bits per vector (16 subspaces x 8
    codewords = 6 bytes vs 256 bytes of float32, a 42x scan-size cut
    for the ADC pass)."""
    m, k = len(codebooks), len(codebooks[0])
    d0 = len(codebooks[0][0])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    code_cols = []
    for s in range(m):
        sub = F.slice(v, s * d0 + 1, d0)
        structs = []
        for j in range(k):
            cw = codebooks[s][j]
            d = F.lit(0.0)
            for t in range(d0):
                diff = F.element_at(sub, t + 1) - F.lit(float(cw[t]))
                d = d + diff * diff
            structs.append(F.struct(F.round(d, 6).alias("dist"),
                                    F.lit(j).alias("j")))
        code_cols.append(F.array_min(F.array(*structs))["j"])
    return embeddings.select(
        "vec_id", F.array(*code_cols).cast("array<int>").alias("codes"))


def pq_topk(embeddings: DataFrame, query_ids: list[int], k_nn: int = 5,
            m: int = 16, k: int = 8, dim: int = 64,
            round_to: int = 6, codebooks: list | None = None) -> DataFrame:
    """PQ-ADC approximate nearest neighbours: encode the corpus to
    m-subspace codes, then for each query compute the asymmetric
    distance sum_s ||q_s - codebook[s][code_s]||^2 via a per-query
    distance TABLE (m*k literals) — the corpus scan reads only the
    code table, never the vectors.

    Scale shape: encoding and the ADC lookup are both pure
    projections against driver-held literals (the distance table is a
    model parameter exactly like the IVF centroids); queries are
    broadcast; the only shuffle is the final per-query top-k window.
    On 100 TB the ADC pass scans the 42x-smaller code table, which is
    the entire point of PQ (Jégou, Douze, Schmid, TPAMI 2011).

    Returns (query_id, vec_id, rank, adc_dist) with adc_dist rounded;
    ties broken by vec_id.  Self-matches excluded."""
    if codebooks is None:
        codebooks = pq_sample_codebooks(embeddings, m, k, dim)
    m, k = len(codebooks), len(codebooks[0])
    d0 = len(codebooks[0][0])
    coded = pq_codes(embeddings, codebooks)
    q = (embeddings.where(F.col("vec_id").isin(query_ids))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").cast("array<double>")
                 .alias("query_vec")))
    # distance table: dt[s][j] = ||q_s - cw(s,j)||^2, per-term rounded
    # like the encoder so both engines fold identical doubles
    dt_entries = []
    for s in range(m):
        for j in range(k):
            d = F.lit(0.0)
            for t in range(d0):
                diff = (F.element_at(F.col("query_vec"), s * d0 + t + 1)
                        - F.lit(float(codebooks[s][j][t])))
                d = d + diff * diff
            dt_entries.append(F.round(d, 6))
    qt = q.select("query_id",
                  F.array(*dt_entries).alias("dt"))  # flat m*k, row-major
    pairs = coded.crossJoin(F.broadcast(qt)).where(
        F.col("vec_id") != F.col("query_id"))
    adc = F.aggregate(
        F.zip_with(F.sequence(F.lit(0), F.lit(m - 1)), F.col("codes"),
                   lambda s, c: F.element_at(
                       F.col("dt"), (s * k + c + 1).cast("int"))),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = pairs.select("query_id", "vec_id",
                          F.round(adc, round_to).alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_nn)
            .select("query_id", "vec_id", "rank", "adc_dist"))


def _hash_component(tok_col, k_col):
    """Deterministic fake embedding component in [-1, 1]: the first 8
    md5 hex digits of "tok:k" as an int, mapped to (h % 2001 - 1000)
    / 1000 — md5 is identical in Spark, DuckDB and Python, so every
    engine (and the driver oracle) reproduces the same vectors.  A
    real deployment swaps this for a stored token-embedding table;
    every downstream join/aggregate is unchanged."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", tok_col, k_col.cast("string"))),
        1, 8), 16, 10).cast("long")
    return ((h % 2001 - 1000).cast("double") / F.lit(1000.0))


def maxsim_topk(documents: DataFrame, query_tokens: list,
                dim: int = 8, top_k: int = 20,
                round_to: int = 6) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR 2020): score(q, d) = sum over query tokens of the MAX
    cosine between that token's vector and any of d's token vectors —
    the multi-vector relevance model that beats single-vector dual
    encoders because each query term independently finds its best
    match in the document.

    Scale shape — the key trick is that token-level similarity only
    depends on the VOCABULARY, not the corpus: cosines are computed
    once per (distinct token, query token) on a vocabulary-sized
    frame (|V| x |Q|, never |docs| x tokens^2), then distributed to
    documents by one equi-join on the token and collapsed with two
    groupBys (max per (doc, query token), sum per doc).  Components
    live as (token, k, c) rows so dot products and norms are plain
    grouped sums — no UDFs, no arrays, whole-stage codegen
    throughout.  At 100 TB the doc-token join is the only
    corpus-sized stage, and it carries two longs + a double.

    Returns (doc_id, rank, maxsim) — top_k docs by (score desc,
    doc_id)."""
    from .dedup import tokens as _tokens
    spark = documents.sparkSession
    toks = (documents
            .select("doc_id",
                    F.explode(_tokens(F.col("text"))).alias("tok"))
            .where(F.length("tok") > 0)
            .distinct())
    vocab = toks.select("tok").distinct()
    ks = spark.range(dim).select(F.col("id").cast("int").alias("k"))
    vcomp = (vocab.crossJoin(F.broadcast(ks))
             .select("tok", "k",
                     _hash_component(F.col("tok"), F.col("k"))
                     .alias("c")))
    vnorm = (vcomp.groupBy("tok")
             .agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nt")))
    q = spark.createDataFrame([(t,) for t in query_tokens],
                              "qt string")
    qcomp = (q.crossJoin(F.broadcast(ks))
             .select("qt", "k",
                     _hash_component(F.col("qt"), F.col("k"))
                     .alias("cq")))
    qnorm = (qcomp.groupBy("qt")
             .agg(F.sqrt(F.sum(F.col("cq") * F.col("cq"))).alias("nq")))
    cos = (vcomp.join(F.broadcast(qcomp), "k")
           .groupBy("tok", "qt")
           .agg(F.sum(F.col("c") * F.col("cq")).alias("dot"))
           .join(vnorm, "tok").join(F.broadcast(qnorm), "qt")
           .select("tok", "qt",
                   F.round(F.col("dot") / (F.col("nt") * F.col("nq")),
                           9).alias("cos")))
    best = (toks.join(cos, "tok")
            .groupBy("doc_id", "qt")
            .agg(F.max("cos").alias("best")))
    scored = (best.groupBy("doc_id")
              .agg(F.round(F.sum("best"), round_to).alias("maxsim")))
    w = Window.orderBy(F.col("maxsim").desc(), "doc_id")
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= int(top_k))
            .select("doc_id", "rank", "maxsim"))
