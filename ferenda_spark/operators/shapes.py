"""Shape validation for constructed triples (SHACL-lite).

A web-scale KG build needs a validation gate between extraction and
publication: the reference validates documents against per-repo
expectations (``ferenda/documentrepository.py`` required-predicate
checks used by its distill tests, and ``ferenda/devel.py``'s
sub-resource completeness audit restated here as
``operators/quality.py``).  SHACL is the W3C-standard generalization
of those checks; this module implements the *node-shape core* that
covers what the reference asserts about its own output graphs:

* ``sh:targetClass`` — which focus nodes a shape applies to,
* ``sh:minCount`` / ``sh:maxCount`` — property cardinality,
* ``sh:pattern`` — object lexical form (regex).

Both operators are pure DataFrame programs sized for 10^12 triples:

* the shapes table is a hand-authored dimension (tens of rows) and is
  always **broadcast**;
* counting is keyed on (focus, path) — never anything coarser — so
  the one shuffle partitions by subject and no reducer sees more than
  one node's property lists;
* pattern checks run inside the same aggregate (``rlike`` is a JVM
  expression; no Python in the path).

``disjoint_violations`` is the matching consistency check for
``owl:disjointWith`` axioms (a node typed with two disjoint classes),
the negative counterpart of the RDFS/OWL entailment materializers in
``operators/graphs.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def shacl_validate(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Validate ``triples`` against a SHACL-lite ``shapes`` dimension.

    ``triples``: (subj, pred, obj) — rdf:type rows select focus nodes.
    ``shapes``: (shape_id, target_class, path, min_count, max_count,
    pattern) — ``max_count`` and ``pattern`` may be NULL (unconstrained).

    Returns one row per violation:
    (focus, shape_id, constraint, expected, actual) where
    ``constraint`` ∈ {'minCount', 'maxCount', 'pattern'} and
    ``expected`` / ``actual`` are integers (for pattern: expected 0
    nonconforming values, actual = the nonconforming count).

    Scale shape: focus selection is one filter; the shapes join is a
    broadcast; value counting is one groupBy on
    (focus, shape_id, path) — the only shuffle, keyed per-node.
    """
    focus = (triples
             .where(F.col("pred") == RDF_TYPE)
             .select(F.col("subj").alias("focus"),
                     F.col("obj").alias("target_class"))
             .distinct())
    targets = focus.join(F.broadcast(shapes), "target_class")
    vals = triples.select(F.col("subj").alias("focus"),
                          F.col("pred").alias("path"),
                          "obj")
    joined = targets.join(vals, ["focus", "path"], "left")
    counted = (joined
               .groupBy("focus", "shape_id", "min_count", "max_count",
                        "pattern")
               .agg(F.count("obj").alias("n"),
                    F.sum(F.when(
                        F.col("pattern").isNotNull()
                        & F.col("obj").isNotNull()
                        & ~F.expr("obj rlike pattern"),
                        1).otherwise(0)).alias("bad")))
    mincv = (counted.where(F.col("n") < F.col("min_count"))
             .select("focus", "shape_id",
                     F.lit("minCount").alias("constraint"),
                     F.col("min_count").cast("long").alias("expected"),
                     F.col("n").cast("long").alias("actual")))
    maxcv = (counted.where(F.col("max_count").isNotNull()
                           & (F.col("n") > F.col("max_count")))
             .select("focus", "shape_id",
                     F.lit("maxCount").alias("constraint"),
                     F.col("max_count").cast("long").alias("expected"),
                     F.col("n").cast("long").alias("actual")))
    patv = (counted.where(F.col("bad") > 0)
            .select("focus", "shape_id",
                    F.lit("pattern").alias("constraint"),
                    F.lit(0).cast("long").alias("expected"),
                    F.col("bad").cast("long").alias("actual")))
    return mincv.unionByName(maxcv).unionByName(patv)


def disjoint_violations(triples: DataFrame,
                        disjoint: DataFrame) -> DataFrame:
    """Nodes typed with two classes declared ``owl:disjointWith``.

    ``disjoint``: (class_a, class_b) axiom dimension (broadcast; the
    caller supplies it in canonical ``class_a < class_b`` order or any
    order — both directions are checked).

    Returns (subj, class_a, class_b) per violating node, one row per
    axiom in canonical order.  Scale shape: the type table self-join
    is keyed on subj (one shuffle); axioms are broadcast.
    """
    types = (triples
             .where(F.col("pred") == RDF_TYPE)
             .select("subj", F.col("obj").alias("cls"))
             .distinct())
    axioms = (disjoint
              .select(F.least("class_a", "class_b").alias("class_a"),
                      F.greatest("class_a", "class_b").alias("class_b"))
              .distinct())
    a = types.select("subj", F.col("cls").alias("class_a"))
    b = types.select("subj", F.col("cls").alias("class_b"))
    both = a.join(b, "subj").where(F.col("class_a") < F.col("class_b"))
    return both.join(F.broadcast(axioms), ["class_a", "class_b"]).select(
        "subj", "class_a", "class_b")
