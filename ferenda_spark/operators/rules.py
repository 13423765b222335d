"""Horn-rule mining over the triple table (AMIE-lite).

The reference *constructs* RDF (DocumentRepository.parse →
distilled graphs) and *validates* it against per-repo expectations
(restated in ``operators/quality.py`` and ``operators/shapes.py``);
the canonical next step of a web-scale KG build is mining the
constructed graph itself for regularities — association rules
``body(x, y) ⇒ head(x, y)`` between predicates — used for KG
completion (predict missing facts) and error detection (facts
violating high-confidence rules).  This is the single-atom core of
AMIE (Galárraga et al., WWW 2013), whose three standard measures we
compute exactly:

* **support** — #distinct pairs (x, y) with BOTH body(x, y) and
  head(x, y);
* **head coverage** — support / #head pairs (recall of the rule);
* **standard confidence** — support / #body pairs (CWA precision);
* **PCA confidence** — support / #body pairs (x, y) where x has *at
  least one* head fact (the partial-completeness denominator that
  made AMIE usable on open-world KGs: a body pair only counts
  against the rule if the subject's head values are known at all).

Scale shape (10^12 triples):

* everything starts from ONE distinct over (subj, pred, obj);
* support is a self-equi-join on **(subj, obj)** — fan-out bounded
  by predicates-per-pair, never corpus-wide;
* the PCA denominator is an equi-join on **subj** of the distinct
  body pairs against the distinct (subj, head_pred) set — fan-out
  bounded by facts-per-subject × predicates-per-subject;
* per-predicate pair counts are a dimension-sized aggregate
  (one row per predicate) that the optimizer broadcasts back;
* all three ratios are single exact IEEE divisions of long counts,
  so a SQL replay matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mine_rules(triples: DataFrame, min_support: int = 1) -> DataFrame:
    """Mine all single-atom rules ``body_pred(x,y) ⇒ head_pred(x,y)``.

    ``triples``: (subj, pred, obj) — duplicates allowed (deduped
    here).  Returns one row per ordered predicate pair with
    ``support >= min_support``:

    (body_pred, head_pred, support, n_body, n_head, head_coverage,
    confidence, pca_confidence)
    """
    t = (triples.select("subj", "pred", "obj").distinct()
         .localCheckpoint(eager=True))

    body = t.select("subj", "obj", F.col("pred").alias("body_pred"))
    head = t.select("subj", "obj", F.col("pred").alias("head_pred"))

    support = (body.join(head, ["subj", "obj"])
               .where(F.col("body_pred") != F.col("head_pred"))
               .groupBy("body_pred", "head_pred")
               .agg(F.count(F.lit(1)).cast("long").alias("support"))
               .where(F.col("support") >= int(min_support)))

    # one row per predicate — broadcast back onto the rule table
    marg = t.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))

    # PCA denominator: distinct body pairs whose subject has ANY
    # head_pred fact.  body is already distinct per (subj, obj,
    # body_pred) and the right side is distinct (subj, head_pred),
    # so the join output is unique — no re-distinct needed.
    heads_by_subj = t.select("subj",
                             F.col("pred").alias("head_pred")).distinct()
    pca = (body.join(heads_by_subj, "subj")
           .where(F.col("body_pred") != F.col("head_pred"))
           .groupBy("body_pred", "head_pred")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pca_body")))

    out = (support
           .join(F.broadcast(marg.withColumnRenamed("pred", "body_pred")
                             .withColumnRenamed("n_pairs", "n_body")),
                 "body_pred")
           .join(F.broadcast(marg.withColumnRenamed("pred", "head_pred")
                             .withColumnRenamed("n_pairs", "n_head")),
                 "head_pred")
           .join(pca, ["body_pred", "head_pred"]))
    sup = F.col("support").cast("double")
    return out.select(
        "body_pred", "head_pred", "support", "n_body", "n_head",
        (sup / F.col("n_head")).alias("head_coverage"),
        (sup / F.col("n_body")).alias("confidence"),
        (sup / F.col("n_pca_body")).alias("pca_confidence"))


def rule_violations(triples: DataFrame, rules: DataFrame,
                    min_confidence: float = 0.9) -> DataFrame:
    """Facts *predicted but absent*: for each mined rule at or above
    ``min_confidence``, body pairs with no head fact — the KG-repair
    work-list (either a missing fact to add or a body fact to audit).

    Rules are a mined dimension (|preds|² rows at most) and broadcast;
    the absence check is one left-anti join on (subj, pred, obj).
    Returns (subj, head_pred, body_pred, confidence).
    """
    t = triples.select("subj", "pred", "obj").distinct()
    r = (rules.where(F.col("confidence") >= float(min_confidence))
         .select("body_pred", "head_pred", "confidence"))
    predicted = (t.withColumnRenamed("pred", "body_pred")
                 .join(F.broadcast(r), "body_pred"))
    existing = t.select(F.col("subj").alias("s2"),
                        F.col("pred").alias("p2"),
                        F.col("obj").alias("o2"))
    return (predicted.join(
        existing,
        (F.col("subj") == F.col("s2"))
        & (F.col("obj") == F.col("o2"))
        & (F.col("head_pred") == F.col("p2")),
        "left_anti")
        .select("subj", "obj", "head_pred", "body_pred", "confidence"))


def mine_inverse_rules(triples: DataFrame,
                       min_support: int = 1) -> DataFrame:
    """Inverse-predicate mining: rules of the form
    ``p(s, o) => q(o, s)`` (parent_of/child_of, cites/cited_by,
    owns/owned_by) -- the alignment signal :func:`mine_rules` cannot
    see because it only joins pairs in the SAME direction.  Support
    counts distinct (s, o) in p whose REVERSED pair is in q;
    confidence divides by p's distinct-pair count (CWA).

    Same relational shape as the forward miner: distinct pairs once,
    one self-join with the key flipped, vocabulary-sized output.
    Returns (body_pred, head_pred, support, n_body, confidence) with
    body <> head pairs only (a symmetric predicate is its own inverse
    and shows up as body = head support; excluded here as it belongs
    to symmetry detection, not inversion).
    """
    t = (triples.select(F.col("subj").alias("s"),
                        F.col("pred").alias("p"),
                        F.col("obj").alias("o")).distinct())
    t = t.localCheckpoint(eager=True)
    fwd = t.select("s", "o", F.col("p").alias("body_pred"))
    rev = t.select(F.col("o").alias("s"), F.col("s").alias("o"),
                   F.col("p").alias("head_pred"))
    sup = (fwd.join(rev, ["s", "o"])
           .where(F.col("body_pred") != F.col("head_pred"))
           .groupBy("body_pred", "head_pred")
           .agg(F.count(F.lit(1)).cast("long").alias("support"))
           .where(F.col("support") >= int(min_support)))
    marg = t.groupBy(F.col("p").alias("body_pred")).agg(
        F.count(F.lit(1)).cast("long").alias("n_body"))
    return (sup.join(F.broadcast(marg), "body_pred")
            .select("body_pred", "head_pred", "support", "n_body",
                    (F.col("support").cast("double") / F.col("n_body"))
                    .alias("confidence")))


def mine_path_rules(triples: DataFrame, min_support: int = 1,
                    max_fanout: int = 64) -> DataFrame:
    """Mine 2-hop chain rules ``p1(x, y) ∧ p2(y, z) ⇒ r(x, z)`` —
    the Path-Ranking-Algorithm feature family (Lao & Cohen 2010) /
    AMIE's length-2 closed rules (Galárraga 2013), one step beyond
    :func:`mine_rules`'s single-atom and :func:`mine_inverse_rules`'s
    inverse forms.  These are the rules that actually explain KG
    links: author∘affiliation ⇒ works_at, cites∘cites ⇒ related.

    Shape and why it scales: the body is ONE self-join of the triple
    table on the chain variable y — keyed on a node id, the same
    shuffle family as the wedge joins in clustering_coefficient /
    cocitation, with the same defense: nodes whose in- or out-degree
    exceeds ``max_fanout`` are dropped from the CHAIN position
    (declared, not silent — the hub that would contribute
    deg_in*deg_out wedges is exactly the node whose paths carry no
    discriminative signal; PRA implementations prune identically).
    Head support is then one join of distinct body pairs against the
    triple table on (x, z), and confidence is exact integer permille.

    Returns (body_p1, body_p2, head_pred, support, n_body_pairs,
    confidence_permille) for rules with support >= ``min_support``,
    where support counts DISTINCT (x, z) pairs satisfying body and
    head, and n_body_pairs counts distinct body pairs.
    """
    t = triples.select(F.col("subj").alias("s"),
                       F.col("pred").alias("p"),
                       F.col("obj").alias("o"))
    deg_in = (t.groupBy(F.col("o").alias("y"))
              .agg(F.count(F.lit(1)).alias("_di")))
    deg_out = (t.groupBy(F.col("s").alias("y"))
               .agg(F.count(F.lit(1)).alias("_do")))
    ok_chain = (deg_in.join(deg_out, "y")
                .where((F.col("_di") <= max_fanout)
                       & (F.col("_do") <= max_fanout))
                .select("y"))
    hop1 = t.select(F.col("s").alias("x"), F.col("p").alias("p1"),
                    F.col("o").alias("y")).join(ok_chain, "y")
    hop2 = t.select(F.col("s").alias("y"), F.col("p").alias("p2"),
                    F.col("o").alias("z"))
    body = (hop1.join(hop2, "y")
            .select("p1", "p2", "x", "z").distinct())
    heads = t.select(F.col("s").alias("x"),
                     F.col("p").alias("head_pred"),
                     F.col("o").alias("z"))
    n_body = (body.groupBy("p1", "p2")
              .agg(F.count(F.lit(1)).cast("long")
                   .alias("n_body_pairs")))
    supp = (body.join(heads, ["x", "z"])
            .groupBy("p1", "p2", "head_pred")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .where(F.col("support") >= int(min_support)))
    return (supp.join(n_body, ["p1", "p2"])
            .select(F.col("p1").alias("body_p1"),
                    F.col("p2").alias("body_p2"),
                    "head_pred", "support", "n_body_pairs",
                    F.expr("1000 * support div n_body_pairs")
                    .cast("long").alias("confidence_permille")))
