"""Knowledge fusion: resolving conflicting claims from many sources.

When a KG is constructed from web-scale crawls, the same (subject,
predicate) is asserted by many pages with conflicting objects; picking
the canonical value is the "knowledge fusion" stage (Dong et al.,
"Knowledge Vault" / "From Data Fusion to Knowledge Fusion", VLDB 2014).
The reference resolves such conflicts implicitly by repo priority when
merging distilled graphs (ferenda's composite repos pick the first
successful parse, compositerepository.py); at web scale the standard
technique is *weighted source voting* with an accuracy-feedback step —
implemented here as two pure DataFrame programs:

* :func:`fact_fusion` — trust-weighted vote per (subject, predicate):
  the object whose asserting sources carry the highest total weight
  wins (ties broken by lexicographic object so the result is a pure
  function of the input).  Shape: one broadcast join against the
  source-trust dimension, one groupBy shuffle on (s, p, o), one
  window on (s, p) — survives 10^12 claims because no step is keyed
  on anything coarser than the fact itself.
* :func:`source_accuracy` — the EM half-step of TruthFinder/ACCU
  (Yin et al. 2008, Dong et al. 2009): re-score each source by the
  fraction of its claims that agree with the fused values.  Emitted
  as exact integers (matches, claims, accuracy in millionths) so the
  result is engine-portable — no float division anywhere.

The round-trip (vote -> accuracy -> re-weighted vote) is the classic
fixpoint; both halves are exposed so a caller can iterate, and each
iteration is two shuffles over the claims table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fact_fusion(claims: DataFrame, weights: DataFrame) -> DataFrame:
    """Pick the winning object per (subject, predicate) by summed
    source weight.

    ``claims``: (subject, predicate, object, source) — one row per
    assertion; duplicate assertions from the same source count once.
    ``weights``: (source, weight) — small trust dimension (broadcast).

    Returns (subject, predicate, object, support, n_sources) for the
    winning object only.  ``support`` is the integer sum of weights,
    ``n_sources`` the distinct-source count behind the winner.
    """
    distinct = claims.select("subject", "predicate", "object",
                             "source").distinct()
    scored = (distinct
              .join(F.broadcast(weights), "source")
              .groupBy("subject", "predicate", "object")
              .agg(F.sum("weight").cast("long").alias("support"),
                   F.countDistinct("source").alias("n_sources")))
    w = Window.partitionBy("subject", "predicate").orderBy(
        F.col("support").desc(), F.col("object").asc())
    return (scored
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .drop("rk"))


def source_accuracy(claims: DataFrame, fused: DataFrame) -> DataFrame:
    """Score each source by agreement with the fused truth.

    ``fused`` is :func:`fact_fusion` output (or any (subject,
    predicate, object) truth table).  A source's claim *matches* when
    its object equals the fused object for that (subject, predicate).

    Returns (source, n_matching, n_claims, accuracy_ppm) with
    ``accuracy_ppm = n_matching * 1_000_000 div n_claims`` — integer
    arithmetic end to end, so Spark and the SQL oracle agree bit-for-
    bit.  Shape: one join on (subject, predicate) — the fused side is
    at most one row per key — and one groupBy on source.
    """
    distinct = claims.select("subject", "predicate", "object",
                             "source").distinct()
    truth = fused.select("subject", "predicate",
                         F.col("object").alias("true_object"))
    joined = distinct.join(truth, ["subject", "predicate"], "left")
    return (joined
            .groupBy("source")
            .agg(F.sum(F.when(F.col("object") == F.col("true_object"), 1)
                       .otherwise(0)).cast("long").alias("n_matching"),
                 F.count(F.lit(1)).cast("long").alias("n_claims"))
            .withColumn("accuracy_ppm",
                        F.expr("n_matching * 1000000 div n_claims")))


def truthfinder_sums(claims: DataFrame, rounds: int = 2) -> DataFrame:
    """Iterative truth finding by the Sums / Hubs-and-Authorities
    fixpoint (Pasternack & Roth, COLING 2010): belief(claim) = sum of
    its asserting sources' trust, trust(source) = sum of its claims'
    beliefs — HITS on the bipartite source-claim graph, the iterative
    upgrade of :func:`fact_fusion`'s single-shot weighted vote (a
    source backing winners gains trust, which feeds back into the
    next round's beliefs).

    Exact integer arithmetic: trust starts at 1e6 micro-units and
    each half-step re-normalizes its vector by the max with integer
    ``div`` (declared re-rounding — the same pinned-iteration
    discipline as the pagerank/label-prop oracles, so both engines
    replay bit-for-bit).

    Scale shape: the edge table (distinct claim-source pairs)
    materializes once; every round is two key-partitioned
    join+groupBy passes moving only the two score vectors, plus two
    1-row max broadcasts — pagerank's loop inventory on a bipartite
    graph.  The winner pick is one window per (subject, predicate).

    Returns (subject, predicate, object, n_sources, belief_micro,
    is_winner)."""
    from pyspark.sql import Window
    ckey = ["subject", "predicate", "object"]
    edges = (claims.select(*ckey, "source").distinct()
             .localCheckpoint())
    src_t = (edges.select("source").distinct()
             .withColumn("t", F.lit(1000000).cast("long")))
    b = None
    for _ in range(rounds):
        b = (edges.join(src_t, "source")
             .groupBy(*ckey)
             .agg(F.sum("t").cast("long").alias("b"),
                  F.countDistinct("source").cast("long")
                  .alias("n_sources")))
        bmax = b.agg(F.max("b").alias("bm"))
        b = (b.crossJoin(F.broadcast(bmax))
             .select(*ckey, "n_sources",
                     F.expr("b * 1000000 div bm").cast("long")
                     .alias("b"))
             .localCheckpoint())
        t = (edges.join(b.select(*ckey, "b"), ckey)
             .groupBy("source")
             .agg(F.sum("b").cast("long").alias("t")))
        tmax = t.agg(F.max("t").alias("tm"))
        src_t = (t.crossJoin(F.broadcast(tmax))
                 .select("source",
                         F.expr("t * 1000000 div tm").cast("long")
                         .alias("t"))
                 .localCheckpoint())
    w = Window.partitionBy("subject", "predicate").orderBy(
        F.col("b").desc(), F.col("object").asc())
    return b.select(*ckey, "n_sources",
                    F.col("b").alias("belief_micro"),
                    (F.row_number().over(w) == 1).alias("is_winner"))
