"""Triple emission: parsed docs -> (subj, pred, obj, obj_datatype,
obj_lang, context) rows.

The Spark restatement of the reference's distill step (SURVEY.md T1/T2):
instead of rendering XHTML+RDFa and re-parsing it (decorators.py:163-184)
we emit triples directly from the parsed columns — document-level
metadata (parse_metadata_from_soup semantics,
documentrepository.py:1202-1242), per-section DocumentPart triples
(w3c.py decorate_bodyparts :290-303), and citation references
(rfc.py:430-452 grammar, minted per uriformatter.py:7-52).

Everything here is JVM-side column expressions (regexp_extract /
concat / explode) — no Python UDFs — so the whole stage stays inside
whole-stage codegen.  The ``context`` column (= source url) is the
named-graph / partition key (triplestore context, SURVEY.md S6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .. import vocab
from ..citations import RFC_FULL_SQL_PATTERN

BASE = "https://example.org/"
DOC_URI_PREFIX = BASE + "res/doc/"
RFC_URI_PREFIX = BASE + "res/rfc/"
ORG_URI_PREFIX = BASE + "res/org/pub"
ENTITY_URI_PREFIX = BASE + "res/entity/"

TRIPLE_COLS = ("subj", "pred", "obj", "obj_datatype", "obj_lang", "context")


def with_doc_metadata(parsed: DataFrame) -> DataFrame:
    """Derive doc_id / canonical doc_uri (T6: canonical_uri =
    {base}res/{alias}/{basefile}, documentrepository.py:631-644; the
    inverse basefile_from_uri is the regexp on url) and the planted
    metadata fields (P5 header-extraction semantics, via JVM regexps
    over the extracted text)."""
    txt = F.col("text")
    return (parsed
            .withColumn("doc_id", F.regexp_extract("url", r"/(\d+)$", 1)
                        .cast("long"))
            .withColumn("doc_uri", F.concat(F.lit(DOC_URI_PREFIX),
                                            F.col("doc_id")))
            .withColumn("publisher_id", F.nullif(F.regexp_extract(
                txt, r"Publisher (\d+)", 1), F.lit("")).cast("int"))
            .withColumn("identifier", F.nullif(F.regexp_extract(
                txt, r"Identifier: (\S+)", 1), F.lit("")))
            .withColumn("issued", F.nullif(F.regexp_extract(
                txt, r"Issued: (\d{4}-\d{2}-\d{2})", 1), F.lit("")))
            .withColumn("subject", F.nullif(F.regexp_extract(
                txt, r"Subject: (topic\d+)", 1), F.lit("")))
            .withColumn("entity_label", F.nullif(F.regexp_extract(
                txt, r"Contact (Entity \d+)\.", 1), F.lit("")))
            .withColumn("same_as_id", F.nullif(F.regexp_extract(
                txt, r"Identical to Document (\d+)\.", 1), F.lit(""))
                .cast("long")))


def _t(subj: Column, pred: str, obj: Column, dtype=None, lang=None) -> Column:
    return F.struct(
        subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
        (F.lit(dtype) if dtype else F.lit(None).cast("string")).alias("obj_datatype"),
        (lang if lang is not None else F.lit(None).cast("string")).alias("obj_lang"))


def doc_triples(docs: DataFrame) -> DataFrame:
    """Document-level metadata triples (one scan: array-of-struct +
    explode instead of a union of projections)."""
    d = F.col("doc_uri")
    trips = F.array(
        _t(d, vocab.RDF_TYPE, F.lit(vocab.BIBO_DOCUMENT)),
        _t(d, vocab.DCTERMS_TITLE, F.col("title"), lang=F.col("lang")),
        _t(d, vocab.DCTERMS_IDENTIFIER, F.col("identifier")),
        _t(d, vocab.DCTERMS_PUBLISHER,
           F.when(F.col("publisher_id").isNotNull(),
                  F.concat(F.lit(ORG_URI_PREFIX), F.col("publisher_id")))),
        _t(d, vocab.DCTERMS_ISSUED, F.col("issued"), dtype=vocab.XSD_DATE),
        _t(d, vocab.DCTERMS_SUBJECT, F.col("subject")),
        _t(d, vocab.PROV_WASGENERATEDBY, F.lit(vocab.GENERATOR_ID)),
        _t(d, vocab.FOAF_PAGE, F.col("url")),
        _t(d, vocab.OWL_SAMEAS,
           F.when(F.col("same_as_id").isNotNull(),
                  F.concat(F.lit(DOC_URI_PREFIX), F.col("same_as_id")))),
    )
    return (docs
            .select(F.col("url").alias("context"), F.explode(trips).alias("t"))
            .where(F.col("t.obj").isNotNull())
            .select("t.subj", "t.pred", "t.obj", "t.obj_datatype",
                    "t.obj_lang", "context"))


def exploded_sections(docs: DataFrame) -> DataFrame:
    """One row per section with its part URI (P13: uri = doc_uri + '#S'
    + ordinal, elements.py:619-620) and its parent URI (isPartOf:
    enclosing section for dotted ordinals else the document)."""
    s = (docs
         .select("url", "doc_uri", "lang",
                 F.explode("sections").alias("sec"))
         .select("url", "doc_uri", "lang",
                 F.col("sec.ordinal").alias("ordinal"),
                 F.col("sec.title").alias("sec_title"),
                 F.col("sec.text").alias("sec_text")))
    part = F.concat(F.col("doc_uri"), F.lit("#S"), F.col("ordinal"))
    parent = F.when(
        F.col("ordinal").contains("."),
        F.concat(F.col("doc_uri"), F.lit("#S"),
                 F.regexp_extract("ordinal", r"^(.*)\.[^.]+$", 1))
    ).otherwise(F.col("doc_uri"))
    return s.withColumn("part_uri", part).withColumn("parent_uri", parent)


def section_triples(docs: DataFrame) -> DataFrame:
    secs = exploded_sections(docs)
    p = F.col("part_uri")
    trips = F.array(
        _t(p, vocab.RDF_TYPE, F.lit(vocab.BIBO_DOCUMENTPART)),
        _t(p, vocab.DCTERMS_TITLE, F.col("sec_title"), lang=F.col("lang")),
        _t(p, vocab.DCTERMS_ISPARTOF, F.col("parent_uri")),
        _t(p, vocab.BIBO_CHAPTER, F.col("ordinal")),
    )
    return (secs
            .select(F.col("url").alias("context"), F.explode(trips).alias("t"))
            .where(F.col("t.obj").isNotNull())
            .select("t.subj", "t.pred", "t.obj", "t.obj_datatype",
                    "t.obj_lang", "context"))


def mention_rows(docs: DataFrame) -> DataFrame:
    """Citation mentions per section (T4): JVM regexp_extract_all for
    the RFC grammar; two-step parse (full match -> groups) keeps it
    codegen-friendly.  Returns (url, part_uri, doc_uri, match, sec,
    rfc, target_uri)."""
    secs = exploded_sections(docs)
    m = (secs
         .select("url", "doc_uri", "part_uri",
                 F.explode(F.regexp_extract_all(
                     "sec_text", F.lit(RFC_FULL_SQL_PATTERN), F.lit(0)))
                 .alias("match")))
    sec = F.regexp_extract("match", r"[Ss]ection\s+([0-9][0-9.]*)\s+of", 1)
    rfc = F.regexp_extract("match", r"RFC\s*([0-9]+)", 1)
    target = F.when(
        rfc != "",
        F.concat(F.lit(RFC_URI_PREFIX),
                 F.regexp_replace(rfc, r"^0+(?=\d)", ""),
                 F.when(sec != "", F.concat(F.lit("#S"),
                                            F.regexp_replace(sec, r"\.$", "")))
                 .otherwise(F.lit(""))))
    return (m.withColumn("sec", sec).withColumn("rfc", rfc)
            .withColumn("target_uri", target)
            .where(F.col("target_uri").isNotNull()))


def mention_triples(docs: DataFrame) -> DataFrame:
    """(section, dcterms:references, minted target) triples (T4/T5)."""
    return (mention_rows(docs)
            .select(F.col("part_uri").alias("subj"),
                    F.lit(vocab.DCTERMS_REFERENCES).alias("pred"),
                    F.col("target_uri").alias("obj"),
                    F.lit(None).cast("string").alias("obj_datatype"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.col("url").alias("context")))


def all_triples(docs: DataFrame) -> DataFrame:
    """The full distilled graph for the corpus (doc ∪ section ∪
    mention triples) — the reference's relate_all dump (S6/S7)."""
    return (doc_triples(docs)
            .unionByName(section_triples(docs))
            .unionByName(mention_triples(docs)))


def reify_statements(triples: DataFrame) -> DataFrame:
    """RDF reification (RDF 1.1 Semantics §5): each (subj, pred, obj)
    becomes an rdf:Statement resource carrying rdf:subject /
    rdf:predicate / rdf:object plus a dcterms:source provenance arc
    from the triple's context — the standard way to attach evidence
    and confidence to KG edges when RDF-star is unavailable (the
    reference stores provenance per named graph; reification is the
    edge-level equivalent).

    Statement ids are skolemized as ``urn:stmt:md5(s|p|o)`` — a pure
    function of the triple, so re-runs and merges of independently
    extracted shards mint the SAME id (idempotent by construction).
    Shape: entirely map-side (an explode of a 5-literal array); no
    shuffle at all."""
    stmt = F.concat(F.lit("urn:stmt:"),
                    F.md5(F.concat_ws("|", "subj", "pred", "obj")))
    five = F.array(
        F.struct(F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
                 .alias("p"),
                 F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                       "Statement").alias("o")),
        F.struct(F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                       "subject").alias("p"), F.col("subj").alias("o")),
        F.struct(F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                       "predicate").alias("p"), F.col("pred").alias("o")),
        F.struct(F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                       "object").alias("p"), F.col("obj").alias("o")),
        F.struct(F.lit("http://purl.org/dc/terms/source").alias("p"),
                 F.col("context").alias("o")))
    return (triples
            .withColumn("stmt_uri", stmt)
            .select("stmt_uri", F.explode(five).alias("po"))
            .select("stmt_uri", F.col("po.p").alias("pred"),
                    F.col("po.o").alias("obj")))


def pred_cooccurrence(triples: DataFrame) -> DataFrame:
    """Schema induction: how often two predicates describe the SAME
    subject — the co-occurrence statistic ontology-discovery tools
    (and the reference's facet selection, which needs to know which
    predicates are dense enough to pivot on) start from.

    Shape: distinct (subj, pred) then a self-equi-join on the subject
    with ``pred_a < pred_b``.  The fan-out per subject is bounded by
    that subject's predicate-set size (tens, not corpus-scale), so
    the self-join is per-key quadratic only in a dimension-sized
    quantity — the same bounded-blocking argument as the LSH bucket
    joins.  Returns (pred_a, pred_b, n_subjects)."""
    sp = triples.select("subj", "pred").distinct()
    a = sp.select("subj", F.col("pred").alias("pred_a"))
    b = sp.select("subj", F.col("pred").alias("pred_b"))
    return (a.join(b, "subj")
            .where(F.col("pred_a") < F.col("pred_b"))
            .groupBy("pred_a", "pred_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_subjects")))


def entity_cooccurrence(doc_entities: DataFrame,
                        id_col: str = "url",
                        ent_col: str = "entity") -> DataFrame:
    """Entity-relatedness mining from co-mention: for every pair of
    entities mentioned in the same document, the co-mention count and
    its LIFT against independence, ``lift = n_docs * c_ab / (c_a *
    c_b)`` — PMI without the log, kept as a single exact IEEE
    division so the statistic is engine-portable (log PMI's libm
    rounding is not).  This is the relatedness graph wikification
    coherence scoring (Milne-Witten style) is built on.

    Shape: distinct (doc, entity), one per-document self-join
    (fan-out bounded by entities-per-doc, tens not corpus-scale —
    the pred_cooccurrence argument), two dimension-sized marginal
    aggregates broadcast back onto the pair table.  Returns
    (entity_a, entity_b, c_ab, c_a, c_b, n_docs, lift)."""
    de = (doc_entities.select(F.col(id_col).alias("d"),
                              F.col(ent_col).alias("e")).distinct()
          .localCheckpoint(eager=True))
    n_docs = de.select("d").distinct().count()
    a = de.select("d", F.col("e").alias("entity_a"))
    b = de.select("d", F.col("e").alias("entity_b"))
    pairs = (a.join(b, "d")
             .where(F.col("entity_a") < F.col("entity_b"))
             .groupBy("entity_a", "entity_b")
             .agg(F.count(F.lit(1)).cast("long").alias("c_ab")))
    marg = de.groupBy(F.col("e")).agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    ma = F.broadcast(marg.select(F.col("e").alias("entity_a"),
                                 F.col("c").alias("c_a")))
    mb = F.broadcast(marg.select(F.col("e").alias("entity_b"),
                                 F.col("c").alias("c_b")))
    return (pairs.join(ma, "entity_a").join(mb, "entity_b")
            .select("entity_a", "entity_b", "c_ab", "c_a", "c_b",
                    F.lit(n_docs).cast("long").alias("n_docs"),
                    ((F.lit(n_docs) * F.col("c_ab")).cast("double")
                     / (F.col("c_a") * F.col("c_b")).cast("double"))
                    .alias("lift")))


def entity_cards(triples: DataFrame) -> DataFrame:
    """Collapse a triple table into one *entity card* per subject —
    the serving-layer export shape (one denormalized record per
    entity with all its facts, what the reference renders as a
    per-document RDF resource page via its generated-XHTML+ToC
    pipeline, documentrepository.py render half).

    Returns (subj, n_triples, n_preds, card) where ``card`` is the
    deterministic "pred=obj" list joined by "; " in (pred, obj)
    order — a canonical textual form, so two builds of the same KG
    diff with plain string equality (the same idea as the sorted
    N-Triples dump in :mod:`ferenda_spark.catalog`, at entity grain).

    Scale shape: one groupBy on subj (the only shuffle); the sort is
    per-group over that entity's own facts (array_sort on the
    collected structs, bounded by facts-per-entity, not corpus
    size).  No Python, no window over a global order.
    """
    pairs = F.array_sort(F.collect_list(
        F.struct(F.col("pred"), F.col("obj"))))
    return (triples
            .select("subj", "pred", "obj")
            .distinct()
            .groupBy("subj")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triples"),
                 F.countDistinct("pred").cast("long").alias("n_preds"),
                 F.array_join(
                     F.transform(pairs,
                                 lambda x: F.concat_ws(
                                     "=", x["pred"], x["obj"])),
                     "; ").alias("card")))
