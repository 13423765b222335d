"""Canonicalization: owl:sameAs equivalence -> connected components ->
rewrite triples onto canonical subjects/objects.

The reference treats sameAs-linked subjects within one document graph
as a single resource cluster (relate_dependencies,
documentrepository.py:1957-1965, SURVEY.md T11); at corpus scale that
generalizes to connected components over the global owl:sameAs edge
set.  Implemented as the iterative **hash-min** label propagation the
north rule names:

* labels start as each vertex's own id;
* each round every vertex takes the min label over itself and its
  neighbors (symmetrized edges);
* converged when the global sum of labels stops decreasing (monotone,
  so one cheap agg per round instead of a change-count join);
* ``localCheckpoint`` every round cuts lineage so plans don't grow
  exponentially (SURVEY.md §4 item 1) — at cluster scale this would be
  ``checkpoint()`` to reliable storage.

Rounds needed = graph diameter; the corpus plants chains of length 4
(doc_id % 4 links to doc_id-1) so convergence takes 3 rounds — the
driver-side loop is O(diameter), each round 2 shuffles (join + groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .triples import DOC_URI_PREFIX
from .. import vocab


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(src:long, dst:long) -> (vertex:long, component:long) where
    component = min vertex id in the component."""
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst"))
           .distinct()
           # materialize once: the loop re-reads sym every round and
           # must not re-run the upstream extraction DAG each time
           .localCheckpoint())
    labels = (sym.select(F.col("src").alias("vertex"))
              .union(sym.select(F.col("dst").alias("vertex")))
              .distinct()
              .withColumn("component", F.col("vertex"))
              .localCheckpoint())
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        neighbor_min = (sym.join(labels,
                                 sym["dst"] == labels["vertex"], "inner")
                        .groupBy(sym["src"].alias("vertex"))
                        .agg(F.min("component").alias("component")))
        labels = (labels.unionByName(neighbor_min)
                  .groupBy("vertex")
                  .agg(F.min("component").alias("component"))
                  .localCheckpoint())
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def sameas_components(triples: DataFrame) -> DataFrame:
    """owl:sameAs triples (doc URIs) -> (doc_uri, canonical_uri).

    Vertex ids are the numeric doc ids embedded in the canonical URI
    scheme (T6), so min-id == min by document number.  (For arbitrary
    URI vertices one would assign ids via a dictionary join first.)"""
    edges = (triples
             .where(F.col("pred") == vocab.OWL_SAMEAS)
             .select(F.regexp_extract("subj", r"(\d+)$", 1).cast("long")
                     .alias("src"),
                     F.regexp_extract("obj", r"(\d+)$", 1).cast("long")
                     .alias("dst")))
    comp = connected_components(edges)
    return comp.select(
        F.concat(F.lit(DOC_URI_PREFIX), "vertex").alias("uri"),
        F.concat(F.lit(DOC_URI_PREFIX), "component").alias("canonical_uri"))


def rewrite_canonical(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical mapping (broadcast when
    small; falls back to shuffle joins on bigger mappings — AQE picks).
    Drops the now-degenerate sameAs self-loops."""
    m = mapping
    out = (triples
           .join(m.withColumnRenamed("uri", "subj")
                  .withColumnRenamed("canonical_uri", "subj_canon"),
                 "subj", "left")
           .join(m.withColumnRenamed("uri", "obj")
                  .withColumnRenamed("canonical_uri", "obj_canon"),
                 "obj", "left")
           .select(F.coalesce("subj_canon", "subj").alias("subj"),
                   "pred",
                   F.coalesce("obj_canon", "obj").alias("obj"),
                   "obj_datatype", "obj_lang", "context"))
    return out.where(~((F.col("pred") == vocab.OWL_SAMEAS)
                       & (F.col("subj") == F.col("obj"))))
