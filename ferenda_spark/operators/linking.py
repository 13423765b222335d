"""Entity linking: label mention -> canonical entity URI.

The reference's lookup_resource (documentrepository.py:467-513,
SURVEY.md T9/J6): exact label match against the small `commondata`
resource graph, else fuzzy match (difflib cutoff 0.8).  Spark design
per the north rule:

* exact path: **broadcast** equi-join against the resources dimension
  (small dim, no shuffle);
* fuzzy path: MinHash-LSH candidate generation over character-3-gram
  sets + exact Jaccard rescoring with a cutoff — candidates only, so
  the quadratic blowup of difflib never materializes at scale; hot
  labels are handled by AQE skew-join (the join is broadcast anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .triples import ENTITY_URI_PREFIX, ORG_URI_PREFIX
from .. import vocab

N_ENTITIES = 50
N_PUBLISHERS = 7


def build_resources(spark: SparkSession) -> DataFrame:
    """The entity dictionary (commondata analogue, FIXTURES.md §2):
    closed-form so the DuckDB oracle can rebuild it with
    generate_series."""
    ents = (spark.range(N_ENTITIES)
            .select(F.concat(F.lit(ENTITY_URI_PREFIX), "id").alias("uri"),
                    F.concat(F.lit("Entity "), "id").alias("label"),
                    F.lit("foaf:Agent").alias("entity_type")))
    pubs = (spark.range(N_PUBLISHERS)
            .select(F.concat(F.lit(ORG_URI_PREFIX), "id").alias("uri"),
                    F.concat(F.lit("Publisher "), "id").alias("label"),
                    F.lit("foaf:Organization").alias("entity_type")))
    return ents.unionByName(pubs)


def exact_links(docs: DataFrame, resources: DataFrame) -> DataFrame:
    """(doc_uri, label, entity_uri, method='exact') via broadcast join."""
    return (docs
            .where(F.col("entity_label").isNotNull())
            .join(F.broadcast(resources),
                  F.col("entity_label") == F.col("label"), "inner")
            .select("url", "doc_uri",
                    F.col("entity_label").alias("label"),
                    F.col("uri").alias("entity_uri"),
                    F.lit("exact").alias("method")))


def entity_mention_triples(docs: DataFrame, resources: DataFrame) -> DataFrame:
    """(doc, schema:mentions, entity) triples from exact links."""
    return (exact_links(docs, resources)
            .select(F.col("doc_uri").alias("subj"),
                    F.lit(vocab.SCHEMA_MENTIONS).alias("pred"),
                    F.col("entity_uri").alias("obj"),
                    F.lit(None).cast("string").alias("obj_datatype"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.col("url").alias("context")))


# ------------------------------------------------------- fuzzy (LSH) path

def _char_ngrams(col, n=3):
    """lowercased character n-gram set of a label, as an array column
    (the shingling for MinHash)."""
    # pad, then slide a window via sequence+transform (JVM-side)
    lowered = F.lower(col)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(1))),
        lambda i: lowered.substr(i, F.lit(n))))


def gram_jaccard_links(mentions: DataFrame, resources: DataFrame,
                       threshold: float = 0.5,
                       label_col: str = "mention_label") -> DataFrame:
    """Deterministic fuzzy linking: char-3-gram Jaccard against the
    (broadcast-sized) resource dictionary, best match per mention.

    Same candidate-then-rescore shape as the LSH path but fully
    SQL-reproducible so the DuckDB oracle can verify it exactly: the
    gram join IS the candidate generation (a mention only meets
    resources sharing >=1 gram — never the full cross product), and the
    grouped count is the exact rescore.  The resource side is broadcast
    (dictionary-sized); skew from hot labels collapses into the
    per-mention groupBy."""
    m = (mentions
         .where(F.col(label_col).isNotNull())
         .withColumn("m_grams", _char_ngrams(F.col(label_col)))
         .withColumn("m_size", F.size("m_grams")))
    r = (resources
         .withColumn("r_grams", _char_ngrams(F.col("label")))
         .withColumn("r_size", F.size("r_grams"))
         .select(F.col("uri").alias("entity_uri"), "r_grams", "r_size",
                 F.explode("r_grams").alias("gram")))
    common = (m.select("mention_id", label_col, "m_size",
                       F.explode("m_grams").alias("gram"))
              .join(F.broadcast(r), "gram")
              .groupBy("mention_id", label_col, "m_size",
                       "entity_uri", "r_size")
              .agg(F.count("*").alias("n_common")))
    scored = common.withColumn(
        "jaccard", F.col("n_common").cast("double")
        / (F.col("m_size") + F.col("r_size") - F.col("n_common")))
    from pyspark.sql import Window
    w = Window.partitionBy("mention_id").orderBy(
        F.col("jaccard").desc(), F.col("entity_uri"))
    return (scored.where(F.col("jaccard") >= threshold)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("mention_id", F.col(label_col).alias("label"),
                    "entity_uri", "jaccard",
                    F.lit("fuzzy").alias("method")))


def _band_buckets(grams_col, num_hashes: int, band_size: int):
    """Array of (band, bucket) structs: banded MinHash-LSH buckets over
    a char-gram array (same md5-chain slice recipe as
    dedup.minhash_band_pairs, so the DuckDB oracle reproduces it
    exactly)."""
    from .dedup import _hash64_col, _minhash_col
    hh = _hash64_col(grams_col, num_hashes)
    mh = [_minhash_col(hh, i) for i in range(num_hashes)]
    structs = []
    for band_start in range(0, num_hashes, band_size):
        band = band_start // band_size
        parts = F.array_sort(F.array(*[
            F.concat(F.lit("%d:" % i), mh[i])
            for i in range(band_start,
                           min(band_start + band_size, num_hashes))]))
        structs.append(F.struct(
            F.lit(band).alias("band"),
            F.md5(F.concat_ws("|", parts)).alias("bucket")))
    return F.array(*structs)


def fuzzy_links_banded(mentions: DataFrame, resources: DataFrame,
                       threshold: float = 0.5,
                       num_hashes: int = 8, band_size: int = 2,
                       label_col: str = "mention_label") -> DataFrame:
    """MinHash-LSH entity linking with the portable md5-banded recipe
    (J6/T9 scale path, fully oracle-checkable unlike pyspark.ml's
    seeded MinHashLSH): char-3-gram minhash signatures -> banded
    buckets on BOTH sides -> candidates = (mention, resource) pairs
    sharing any (band, bucket) -> exact gram-Jaccard rescore ->
    best-above-threshold per mention.

    Scale shape: signatures and buckets are map-side column
    expressions; the only shuffle is the candidate equi-join on
    (band, bucket) (resource side broadcast — it is the dictionary).
    Candidate count is bounded by bucket collisions, never the
    mentions x resources cross product.  Returns (mention_id, label,
    entity_uri, jaccard, method='lsh')."""
    m = (mentions
         .where(F.col(label_col).isNotNull())
         .withColumn("m_grams", _char_ngrams(F.col(label_col)))
         .where(F.size("m_grams") > 0)
         .withColumn("m_size", F.size("m_grams")))
    r = (resources
         .withColumn("r_grams", _char_ngrams(F.col("label")))
         .where(F.size("r_grams") > 0)
         .withColumn("r_size", F.size("r_grams"))
         .select(F.col("uri").alias("entity_uri"), "r_grams", "r_size"))
    mb = (m.select("mention_id", label_col, "m_grams", "m_size",
                   F.explode(_band_buckets(F.col("m_grams"), num_hashes,
                                           band_size)).alias("bb"))
          .select("mention_id", label_col, "m_grams", "m_size",
                  "bb.band", "bb.bucket"))
    rb = (r.select("entity_uri", "r_grams", "r_size",
                   F.explode(_band_buckets(F.col("r_grams"), num_hashes,
                                           band_size)).alias("bb"))
          .select("entity_uri", "r_grams", "r_size",
                  "bb.band", "bb.bucket"))
    cand = (mb.join(F.broadcast(rb), ["band", "bucket"])
            .select("mention_id", label_col, "m_grams", "m_size",
                    "entity_uri", "r_grams", "r_size")
            .distinct())
    inter = F.size(F.array_intersect("m_grams", "r_grams"))
    scored = cand.withColumn(
        "jaccard", inter.cast("double")
        / (F.col("m_size") + F.col("r_size") - inter))
    w = Window.partitionBy("mention_id").orderBy(
        F.col("jaccard").desc(), F.col("entity_uri"))
    return (scored.where(F.col("jaccard") >= threshold)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("mention_id", F.col(label_col).alias("label"),
                    "entity_uri", "jaccard", F.lit("lsh").alias("method")))


def fuzzy_links(mentions: DataFrame, resources: DataFrame,
                threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard rescore for
    labels that failed the exact join.

    mentions: DataFrame with (url, doc_uri, entity_label).
    Returns (url, doc_uri, label, entity_uri, jaccard, method='fuzzy').
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    m = (mentions
         .where(F.col("entity_label").isNotNull())
         .withColumn("grams", _char_ngrams(F.col("entity_label")))
         .where(F.size("grams") > 0))
    r = (resources
         .withColumn("grams", _char_ngrams(F.col("label")))
         .where(F.size("grams") > 0))

    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=5, seed=42)
    rf = tf.transform(r)
    mf = tf.transform(m)
    model = mh.fit(rf)
    pairs = model.approxSimilarityJoin(
        mf, rf, 1.0 - threshold, distCol="jaccard_dist")
    return (pairs
            .select(F.col("datasetA.url").alias("url"),
                    F.col("datasetA.doc_uri").alias("doc_uri"),
                    F.col("datasetA.entity_label").alias("label"),
                    F.col("datasetB.uri").alias("entity_uri"),
                    (1 - F.col("jaccard_dist")).alias("jaccard"),
                    F.lit("fuzzy").alias("method")))


def sorted_neighborhood_pairs(df: DataFrame, key_cols: list,
                              window: int = 4,
                              block_chars: int = 4,
                              id_col: str = "doc_id") -> DataFrame:
    """Multi-pass sorted-neighborhood blocking (Hernandez & Stolfo
    1995), the sort-based classic next to this module's LSH blocking:
    per pass, records sort by a fuzzy key and every record pairs with
    its ``window - 1`` successors; unioning several passes with
    different keys recovers matches that any single sort order splits.

    A naive global sort collapses to one partition at scale, so each
    pass blocks on the first ``block_chars`` characters of its key
    and sorts *within* the block (rank window partitioned by block) —
    the standard distributed SNM compromise: pairs straddling a block
    boundary are lost in that pass, which is exactly what the extra
    passes with independent keys are for.  Candidate pairing is an
    equi-join on (block, rank + j), j in 1..window-1 — never an
    inequality join.

    ``key_cols``: list of (pass_name, Column) tuples.  Returns
    (id_a, id_b, n_passes) with id_a < id_b, deduped across passes.
    """
    out = None
    for pass_name, key in key_cols:
        keyed = df.select(F.col(id_col).alias("rid"),
                          key.alias("k")).where(F.col("k").isNotNull())
        keyed = keyed.withColumn(
            "blk", F.substring("k", 1, block_chars))
        w = Window.partitionBy("blk").orderBy(
            F.col("k").asc(), F.col("rid").asc())
        ranked = keyed.select("rid", "blk",
                              F.row_number().over(w).alias("rk"))
        probes = (ranked
                  .select(F.col("rid").alias("rid_a"), "blk",
                          F.col("rk").alias("rk0"),
                          F.explode(F.sequence(
                              F.lit(1), F.lit(window - 1))).alias("j"))
                  .select("rid_a", "blk",
                          (F.col("rk0") + F.col("j")).alias("rk")))
        pairs = (probes
                 .join(ranked.select(F.col("rid").alias("rid_b"),
                                     "blk", "rk"), ["blk", "rk"])
                 .select(F.least("rid_a", "rid_b").alias("id_a"),
                         F.greatest("rid_a", "rid_b").alias("id_b"))
                 .distinct()
                 .withColumn("pass_name", F.lit(pass_name)))
        out = pairs if out is None else out.unionByName(pairs)
    return (out
            .groupBy("id_a", "id_b")
            .agg(F.countDistinct("pass_name").cast("long")
                 .alias("n_passes")))


def disambiguate_by_context(mentions: DataFrame, candidates: DataFrame,
                            profiles: DataFrame) -> DataFrame:
    """Entity disambiguation by context-token overlap (the classic
    Bagga & Baldwin / wikification baseline): among a mention's
    candidate entities, the one whose profile shares the most tokens
    with the mention's context wins; ties break to the smallest
    entity id so the result is a pure function of the input.

    ``mentions``: (mention_id, context_tokens array<string>);
    ``candidates``: (mention_id, entity_id) — the ambiguous ones have
    several rows; ``profiles``: (entity_id, profile_tokens).

    Score = |context ∩ profile| via array_intersect — set semantics,
    duplicates don't inflate the overlap.  Shape: one join per side
    of the candidate table (mention-keyed, then entity-keyed — the
    profile side is entity-dimension-sized and broadcasts when it
    fits) + one window per mention, bounded by its candidate count.
    Returns (mention_id, entity_id, overlap, n_candidates)."""
    scored = (candidates
              .join(mentions, "mention_id")
              .join(profiles, "entity_id")
              .withColumn("overlap",
                          F.size(F.array_intersect(
                              F.array_distinct("context_tokens"),
                              F.array_distinct("profile_tokens")))
                          .cast("long")))
    w = Window.partitionBy("mention_id").orderBy(
        F.col("overlap").desc(), F.col("entity_id").asc())
    return (scored
            .withColumn("rk", F.row_number().over(w))
            .groupBy("mention_id")
            .agg(F.max(F.when(F.col("rk") == 1, F.col("entity_id")))
                 .alias("entity_id"),
                 F.max(F.when(F.col("rk") == 1, F.col("overlap")))
                 .alias("overlap"),
                 F.count(F.lit(1)).cast("long").alias("n_candidates")))


def distant_supervision(pair_contexts: DataFrame, kb: DataFrame,
                        na_label: str = "NA") -> DataFrame:
    """Distant-supervision relation labeling (Mintz et al. 2009): a
    sentence context mentioning entity pair (subj, obj) is labeled
    with the KB relation that holds between them, or ``NA`` when the
    KB has no edge — the standard way web-scale relation-extraction
    training sets are built from a seed KG.

    ``pair_contexts``: (context_id, subj, obj); ``kb``: (subj, obj,
    relation).  One (subj, obj)-keyed left equi-join; the KB side is
    entity-pair-dimension-sized and broadcasts when it fits (at
    10^9-edge KBs it's a plain shuffle join on the pair key — still
    one shuffle).  Contexts whose pair carries several KB relations
    emit one labeled row per relation (multi-instance learning keeps
    them all).  Returns (context_id, subj, obj, relation)."""
    return (pair_contexts
            .join(kb.select("subj", "obj", "relation"),
                  ["subj", "obj"], "left")
            .select("context_id", "subj", "obj",
                    F.coalesce("relation", F.lit(na_label))
                    .alias("relation")))


def nil_clustering(linked: DataFrame, threshold: int,
                   surface_col: str = "surface",
                   score_col: str = "overlap",
                   entity_col: str = "entity_id") -> DataFrame:
    """NIL detection + clustering (the TAC-KBP step after entity
    linking): mentions whose best link score is below ``threshold``
    are NIL — they refer to an entity the KG doesn't know yet — and
    are clustered by normalized surface form; each cluster mints one
    deterministic new entity (``urn:nil:<normalized form>``), the
    input row for the KG's entity-creation stage.

    ``linked``: (mention_id, <entity_col>, <score_col>,
    <surface_col>).  Normalization = lowercase + squeeze whitespace.
    Shape: one projection (the NIL/keep decision is a row-local
    CASE), one groupBy on the resolved entity for cluster sizes, one
    join back keyed the same way — two shuffles total, no windows, no
    collect.  Returns (mention_id, resolved_entity, is_nil,
    cluster_size) where cluster_size counts the mentions resolved to
    that entity (known entities get their mention count too — the
    popularity signal comes free)."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(surface_col))), r"\s+", " ")
    rows = linked.select(
        "mention_id",
        (F.col(score_col) < threshold).alias("is_nil"),
        F.when(F.col(score_col) < threshold,
               F.concat(F.lit("urn:nil:"), norm))
        .otherwise(F.col(entity_col).cast("string"))
        .alias("resolved_entity"))
    sizes = (rows.groupBy("resolved_entity")
             .agg(F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return rows.join(sizes, "resolved_entity").select(
        "mention_id", "resolved_entity", "is_nil", "cluster_size")


def coref_chains(mentions: DataFrame, pronouns: tuple = (
        "he", "she", "it", "they", "him", "her", "them")) -> DataFrame:
    """Coreference-lite: resolve pronoun mentions to the entity of
    the nearest preceding non-pronoun mention in the same document —
    the recency heuristic that anchors rule-based coref systems and
    is the usual precision floor reported for web-scale KG pipelines.

    ``mentions``: (url, pos, surface, entity) where pronoun rows have
    ``entity`` NULL.  One window per document ordered by position,
    ``last(entity, ignorenulls=True)`` — Spark evaluates it as a
    running frame, so cost is a single per-doc sort, the same shape
    as the sessionizer; documents are independent so the window never
    crosses partitions at scale.  Pronouns with no antecedent stay
    NULL (unresolved).  Returns (url, pos, surface, entity,
    resolved_entity, is_pronoun)."""
    from pyspark.sql import Window
    is_pron = F.lower(F.col("surface")).isin(*[p for p in pronouns])
    w = (Window.partitionBy("url").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (mentions
            .withColumn("is_pronoun", is_pron)
            .withColumn(
                "resolved_entity",
                F.coalesce(F.col("entity"),
                           F.last(F.when(~is_pron, F.col("entity")),
                                  ignorenulls=True).over(w))))


def alias_priors(anchors: DataFrame, surface_col: str = "surface",
                 entity_col: str = "entity") -> DataFrame:
    """Alias-table construction: from (surface form, linked entity)
    observations — anchor texts pointing at known pages are the
    classic source — compute the commonness prior
    P(entity | surface) and each surface's candidate rank, the lookup
    table every wikification system starts from (Medelyan 2008,
    Milne & Witten).

    Shape: one (surface, entity) count groupBy, one surface-total
    groupBy reusing the same key prefix, one join back, one
    per-surface rank window over the (small) candidate list — all
    shuffles keyed on the surface form, no collect.  Ties rank
    deterministically by entity id.  Returns (surface, entity, n,
    prior, rank)."""
    from pyspark.sql import Window
    pairs = (anchors
             .select(F.lower(F.trim(F.col(surface_col)))
                     .alias("surface"),
                     F.col(entity_col).alias("entity"))
             .groupBy("surface", "entity")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    totals = (pairs.groupBy("surface")
              .agg(F.sum("n").cast("long").alias("total")))
    w = Window.partitionBy("surface").orderBy(
        F.col("n").desc(), F.col("entity").asc())
    return (pairs.join(totals, "surface")
            .select("surface", "entity", "n",
                    (F.col("n") / F.col("total")).alias("prior"),
                    F.row_number().over(w).cast("long").alias("rank")))


def bitext_candidates(pages: DataFrame, ratio: float = 2.0,
                      url_col: str = "url", lang_col: str = "lang",
                      text_col: str = "text") -> DataFrame:
    """Parallel-page candidate mining by URL structure — the
    CCAligned / WikiMatrix first stage (El-Kishky et al. 2020): two
    pages of the same site whose paths differ ONLY in a language
    segment (``https://host/{lang}/rest``) are translation
    candidates, pre-filtered by the standard length-ratio test
    (Gale & Church): max(len_a, len_b) <= ratio * min(len_a, len_b).

    Shape: one map-side regexp parse of the URL into
    (host, path_key), then a self-equi-join on that key with
    ``lang_a < lang_b`` ordering (each unordered pair once) — the
    URL-matching trick is exactly what makes this scale: candidates
    come from a hash join on a fine-grained key instead of an
    O(n^2) cross-lingual comparison.  Hot path_keys (a site with
    many language versions) fan out quadratically per key but are
    bounded by the language count, not the corpus.  Returns
    (host, path_key, lang_a, url_a, len_a, lang_b, url_b, len_b)."""
    parsed = pages.select(
        F.regexp_extract(F.col(url_col),
                         r"^https?://([^/]+)/", 1).alias("host"),
        F.regexp_extract(F.col(url_col),
                         r"^https?://[^/]+/[a-z]{2}(?:-[A-Za-z]{2})?/(.*)$",
                         1).alias("path_key"),
        F.col(lang_col).alias("lang"),
        F.col(url_col).alias("url"),
        F.length(F.col(text_col)).cast("long").alias("len"))
    parsed = parsed.where(F.col("path_key") != "")
    a = parsed.select(F.col("host"), F.col("path_key"),
                      F.col("lang").alias("lang_a"),
                      F.col("url").alias("url_a"),
                      F.col("len").alias("len_a"))
    b = parsed.select(F.col("host"), F.col("path_key"),
                      F.col("lang").alias("lang_b"),
                      F.col("url").alias("url_b"),
                      F.col("len").alias("len_b"))
    return (a.join(b, ["host", "path_key"])
            .where(F.col("lang_a") < F.col("lang_b"))
            .where(F.greatest("len_a", "len_b")
                   <= ratio * F.least("len_a", "len_b")))


def entity_salience(mentions: DataFrame, id_col: str = "url",
                    ent_col: str = "target_uri") -> DataFrame:
    """Per-(document, entity) salience scoring from mention evidence
    — the feature stage entity-salience systems (Dunietz & Gillick
    2014; SEL) run between linking and KG ingestion: how central is
    this entity to this page, beyond merely appearing on it?

    Features are closed-form integers from the mention offsets —
    n_mentions, first_start (earlier = more salient, the
    first-position feature), spread (last_end - first_start, mention
    dispersion) — plus ``salience = n_mentions / (1 + first_start)``
    (a single IEEE division, engine-exact) and the per-document rank
    by (n_mentions DESC, first_start ASC, entity ASC).

    Shape: one (id, entity) groupBy with map-side partial
    aggregation, then a window partitioned BY DOCUMENT (cardinality
    = entities-per-page, bounded ~10^2, never corpus-wide) for the
    rank — the same per-key window discipline as the TOC/feed
    rankers.  Returns (id, entity, n_mentions, first_start, spread,
    salience, rank)."""
    from pyspark.sql import Window
    per = (mentions.groupBy(F.col(id_col).alias("id"),
                            F.col(ent_col).alias("entity"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"),
                F.min("start").cast("long").alias("first_start"),
                (F.max("end") - F.min("start")).cast("long")
                .alias("spread")))
    w = Window.partitionBy("id").orderBy(
        F.col("n_mentions").desc(), F.col("first_start").asc(),
        F.col("entity").asc())
    return per.select(
        F.col("id").alias(id_col), F.col("entity").alias(ent_col),
        "n_mentions", "first_start", "spread",
        (F.col("n_mentions").cast("double")
         / (F.lit(1) + F.col("first_start"))).alias("salience"),
        F.row_number().over(w).cast("long").alias("rank"))


def fs_linkage(left: DataFrame, right: DataFrame, fields: list,
               m_probs: dict, block_col: str = "block_key",
               id_left: str = "left_id", id_right: str = "right_id",
               upper: float = 4.0, lower: float = 0.0,
               round_to: int = 6) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969): score
    each blocked candidate pair by the sum of per-field log2
    likelihood ratios — agreement on field f contributes
    log2(m_f/u_f), disagreement log2((1-m_f)/(1-u_f)) — and classify
    against the (lower, upper) thresholds into link / possible /
    non-link.

    * ``m_probs`` (P(agree | match)) are driver-held model parameters,
      as in every production FS deployment (estimated offline by EM or
      clerical review).
    * ``u_f`` (P(agree | non-match)) is estimated from the data as the
      collision probability of field f on the RIGHT side:
      sum_v (n_v / N)^2 — the classic frequency-based u, computed with
      one groupBy per field over right (each a dimension-sized
      aggregate, combined driver-side into literals).

    Scale shape: u estimation is f small aggregates; the pair scoring
    is a blocked equi-join (block key = the caller's blocking rule,
    same discipline as sorted-neighborhood / LSH blocking elsewhere in
    this module) with all weights evaluated as column expressions —
    no UDFs, no driver loops over pairs.

    Returns (left_id, right_id, agree_<f>... , weight, decision)."""
    import math

    n = right.count()
    us = {}
    for f in fields:
        cnt = right.groupBy(f).agg(F.count(F.lit(1)).alias("c"))
        s = (cnt.agg(F.sum(F.col("c") * F.col("c")).alias("s"))
             .collect()[0].s)
        u = max(min(float(s) / (float(n) * float(n)), 1.0 - 1e-9), 1e-9)
        us[f] = u
    l = left.select(F.col(id_left), F.col(block_col),
                    *[F.col(f).alias("l_" + f) for f in fields])
    r = right.select(F.col(id_right), F.col(block_col),
                     *[F.col(f).alias("r_" + f) for f in fields])
    pairs = l.join(r, block_col)
    weight = F.lit(0.0)
    out_cols = [F.col(id_left), F.col(id_right)]
    for f in fields:
        m = float(m_probs[f])
        u = us[f]
        agree = (F.col("l_" + f) == F.col("r_" + f))
        w_a = round(math.log2(m / u), round_to)
        w_d = round(math.log2((1.0 - m) / (1.0 - u)), round_to)
        weight = weight + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
        out_cols.append(agree.alias("agree_" + f))
    weight = F.round(weight, round_to)
    decision = (F.when(weight >= upper, "link")
                .when(weight > lower, "possible")
                .otherwise("non_link"))
    return pairs.select(*out_cols, weight.alias("weight"),
                        decision.alias("decision"))


def margin_bitext_pairs(src: DataFrame, tgt: DataFrame, k: int = 4,
                        min_margin_permille: int = 1000,
                        pairs: DataFrame = None) -> DataFrame:
    """Margin-based bitext mining over sentence/document embeddings —
    the Artetxe & Schwenk (2019) ratio-margin criterion that CCMatrix
    / LASER pipelines use to pick translation pairs out of a crawl:
    a pair scores by its cosine RELATIVE to each side's average
    top-k cosine, so hub vectors (close to everything) don't win.

        margin(x, y) = 2 cos(x,y) / (avg_k fwd(x) + avg_k bwd(y))

    All scoring is integer after the cosine: micro-cosines
    (``floor(cos * 1e6)`` as long), integer sums/counts, and a final
    permille margin via integer division — no float ever crosses an
    engine or shuffle boundary, so results are bit-stable across
    engines and partitionings.  Non-positive-cosine pairs are dropped
    up front (they cannot be translations, and they would make the
    integer division sign-ambiguous); sides with fewer than k
    positive neighbours use their true neighbour count, i.e. the
    margin stays the exact ratio of true averages.

    ``src`` = (src_id, src_vec), ``tgt`` = (tgt_id, tgt_vec).  By
    default candidates are src x broadcast(tgt) — right when one
    side fits an executor (the usual low-resource-language shape);
    at two-large-sides scale pass ``pairs`` (src_id, tgt_id,
    src_vec, tgt_vec) from an LSH/IVF candidate stage instead
    (similarity.sign_bucket_bands / ivf assign).  Two window
    shuffles (by src_id, by tgt_id) + one aggregate join; returns
    the best target per source, (src_id, tgt_id, cos_micro,
    margin_permille), filtered to ``min_margin_permille``."""
    if pairs is None:
        pairs = src.crossJoin(F.broadcast(tgt))
    a = F.transform(F.col("src_vec"), lambda x: x.cast("double"))
    b = F.transform(F.col("tgt_vec"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda v: F.sqrt(F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x))
    scored = (pairs
              .withColumn("cos_micro",
                          F.floor(dot / (norm(a) * norm(b))
                                  * F.lit(1000000.0)).cast("long"))
              .where(F.col("cos_micro") > 0)
              .select("src_id", "tgt_id", "cos_micro"))
    wf = Window.partitionBy("src_id").orderBy(
        F.desc("cos_micro"), "tgt_id")
    wb = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_micro"), "src_id")
    ranked = (scored
              .withColumn("rf", F.row_number().over(wf))
              .withColumn("rb", F.row_number().over(wb)))
    fs = (ranked.where(F.col("rf") <= k).groupBy("src_id")
          .agg(F.sum("cos_micro").alias("fwd"),
               F.count("*").alias("n_f")))
    bs = (ranked.where(F.col("rb") <= k).groupBy("tgt_id")
          .agg(F.sum("cos_micro").alias("bwd"),
               F.count("*").alias("n_b")))
    m = (scored.join(fs, "src_id").join(bs, "tgt_id")
         .withColumn(
             "margin_permille",
             F.expr("(2000 * cos_micro * n_f * n_b) div "
                    "(fwd * n_b + bwd * n_f)")))
    wr = Window.partitionBy("src_id").orderBy(
        F.desc("margin_permille"), "tgt_id")
    return (m.withColumn("rn", F.row_number().over(wr))
            .where((F.col("rn") == 1)
                   & (F.col("margin_permille")
                      >= min_margin_permille))
            .select("src_id", "tgt_id", "cos_micro",
                    "margin_permille"))


#: Gale & Church (1993) bead priors -- the published values.
_GC_PRIORS = {(1, 1): 0.89, (1, 0): 0.0099, (0, 1): 0.0099,
              (2, 1): 0.089, (1, 2): 0.089, (2, 2): 0.011}
_GC_C = 1.0          # expected char-length ratio b/a
_GC_S2 = 6.8         # variance per mean char


def _gc_cost(la: int, lb: int, prior: float) -> float:
    import math
    if la == 0 and lb == 0:
        return 0.0
    m = (la + lb / _GC_C) / 2.0
    delta = abs(lb - la * _GC_C) / math.sqrt(m * _GC_S2)
    # two-sided tail of the standard normal, floored away from 0
    tail = max(2.0 * (1.0 - 0.5 * (1.0 + math.erf(
        delta / math.sqrt(2.0)))), 1e-12)
    return -math.log(prior) - math.log(tail)


def _gc_align(a_lens: list, b_lens: list) -> list:
    """Dynamic program over sentence-length beads; returns
    (a_start, n_a, b_start, n_b) tuples in order.  Deterministic:
    ties broken by the fixed move order below."""
    MOVES = ((1, 1), (1, 0), (0, 1), (2, 1), (1, 2), (2, 2))
    na, nb = len(a_lens), len(b_lens)
    INF = float("inf")
    cost = [[INF] * (nb + 1) for _ in range(na + 1)]
    back = [[None] * (nb + 1) for _ in range(na + 1)]
    cost[0][0] = 0.0
    for i in range(na + 1):
        for j in range(nb + 1):
            base = cost[i][j]
            if base == INF:
                continue
            for da, db in MOVES:
                ni, nj = i + da, j + db
                if ni > na or nj > nb:
                    continue
                c = base + _gc_cost(sum(a_lens[i:ni]),
                                    sum(b_lens[j:nj]),
                                    _GC_PRIORS[(da, db)])
                if c < cost[ni][nj] - 1e-12:
                    cost[ni][nj] = c
                    back[ni][nj] = (da, db)
    beads, i, j = [], na, nb
    while i > 0 or j > 0:
        da, db = back[i][j]
        beads.append((i - da, da, j - db, db))
        i, j = i - da, j - db
    beads.reverse()
    return beads


GC_SCHEMA = ("pair_id long, bead_id int, a_start int, n_a int, "
             "b_start int, n_b int, bead string")


def galechurch_align(sentences: DataFrame) -> DataFrame:
    """Gale-Church (1993) length-based sentence alignment per
    document pair -- the classical bitext step between document
    matching (:func:`margin_bitext_pairs` / :func:`bitext_candidates`)
    and translation-pair emission: align side ``a``'s sentences to
    side ``b``'s by a DP over character lengths with the published
    bead priors (1-1, 1-0/0-1, 2-1/1-2, 2-2).

    Input: (pair_id, side in {'a','b'}, sent_id, n_chars) -- lengths
    only, so the (possibly huge) sentence text never enters the
    shuffle; join the emitted (start, count) spans back to text by
    (pair_id, side, sent_id) afterwards.

    Scale shape: ``applyInPandas`` grouped by pair_id -- one shuffle
    on pair_id; each group is one document pair (bounded), the DP is
    O(na*nb) per pair with a constant move set.  The DP's float math
    never leaves Python: the OUTPUT is pure integers (spans), so
    results are engine- and partitioning-stable.

    Returns (pair_id, bead_id, a_start, n_a, b_start, n_b, bead)
    with bead the "1-1"/"2-1"/... label and n_a = 0 for insertions.
    """
    import pandas as pd

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        pair_id = int(pdf["pair_id"].iloc[0])
        a = (pdf[pdf["side"] == "a"].sort_values("sent_id")
             ["n_chars"].tolist())
        b = (pdf[pdf["side"] == "b"].sort_values("sent_id")
             ["n_chars"].tolist())
        rows = [(pair_id, k, ast, na, bst, nb,
                 "%d-%d" % (na, nb))
                for k, (ast, na, bst, nb)
                in enumerate(_gc_align(a, b))]
        return pd.DataFrame(rows, columns=[
            "pair_id", "bead_id", "a_start", "n_a", "b_start",
            "n_b", "bead"])

    # Pre-hash-partition on the group key: applyInPandas' required
    # clustering is then already satisfied, so Spark keeps this
    # explicit width instead of letting AQE coalesce the tiny
    # length-only shuffle to ONE post-shuffle partition — which
    # would serialize all pairs through a single Python worker and
    # pay the per-group Arrow/pandas overhead (~4 ms/group) x
    # n_pairs on one core (measured 19 s for 5k pairs at sf0.1;
    # ~1 s spread over 32).
    spark = sentences.sparkSession
    width = spark.sparkContext.defaultParallelism
    return (sentences.repartition(width, "pair_id")
            .groupBy("pair_id")
            .applyInPandas(align, schema=GC_SCHEMA))


def identity_stitch(observations: DataFrame,
                    id_cols: list) -> DataFrame:
    """Cross-device identity resolution (the adtech/analytics
    "identity graph"): identifiers co-observed on the same event —
    cookie, device id, login — link into one identity, and the
    stitched component gets a deterministic canonical id.  This is
    entity resolution where the blocking key is the observation
    row itself, and the transitive closure is what merges
    cookie↔device↔second-device chains no pairwise rule sees.

    Shape: star edges from the first id column to each other column
    (pairwise closure is redundant under connected components), ONE
    distinct collapses event volume to identifier-pair volume, and
    the closure is the shared hash-min fixpoint — the SAME kernel as
    owl:sameAs canonicalization (canonicalize.py), because identity
    stitching IS sameAs over behavioral ids.  Canonical = the
    (length, value)-minimal member, engine-replayable.

    Returns (identifier, canonical_id) covering every observed
    identifier, self-mapping included."""
    from .canonicalize import connected_components_uris
    base = F.col(id_cols[0])
    edges = None
    for c in id_cols[1:]:
        e = (observations
             .where(base.isNotNull() & F.col(c).isNotNull())
             .select(base.alias("src"), F.col(c).alias("dst")))
        edges = e if edges is None else edges.unionByName(e)
    return (connected_components_uris(edges.distinct())
            .select(F.col("uri").alias("identifier"),
                    F.col("canonical_uri").alias("canonical_id")))


def snowball_bootstrap(sentences: DataFrame, seeds: DataFrame,
                       threshold_permille: int = 600,
                       sent_col: str = "sent") -> DataFrame:
    """Snowball-style bootstrapped relation extraction (Agichtein &
    Gravano 2000), the pattern-induction loop between
    :func:`distant_supervision` (fixed KB) and hand-written Hearst
    patterns: (1) tag each sentence's entity pair and MIDDLE context,
    (2) score every context against the seed pairs — confidence =
    1000 * supporting_mentions div total_seed-entity_mentions
    (mention-level scoring, declared variant of Snowball's
    distinct-pair ratio), (3) keep contexts over the threshold,
    (4) re-extract: every pair asserted through a kept context,
    scored by its best pattern.

    Sentences arrive pre-tagged as '<ENT1> <middle words> <ENT2>'
    (the NER step is upstream); the pair/middle split is one
    regexp_extract in the scan map.  Shape: pattern scoring is one
    middle-keyed aggregate over seed-entity mentions (seeds
    broadcast); re-extraction is one broadcast semi-join on the kept
    patterns (pattern table is vocabulary-sized) plus one pair
    aggregate.  All counters exact longs, confidence integer
    permille.

    Returns (subject, object, confidence_permille, n_mentions,
    is_seed_subject)."""
    tagged = sentences.select(
        F.regexp_extract(F.col(sent_col), r"^(\S+) (.*) (\S+)$", 1)
        .alias("subject"),
        F.regexp_extract(F.col(sent_col), r"^(\S+) (.*) (\S+)$", 2)
        .alias("middle"),
        F.regexp_extract(F.col(sent_col), r"^(\S+) (.*) (\S+)$", 3)
        .alias("object")).where(F.col("middle") != "")
    sd = F.broadcast(seeds.select(F.col("subject").alias("s_subj"),
                                  F.col("object").alias("s_obj"))
                     .distinct())
    scored = (tagged.join(sd, tagged["subject"] == sd["s_subj"])
              .groupBy("middle")
              .agg(F.sum(F.when(F.col("object") == F.col("s_obj"), 1)
                         .otherwise(0)).cast("long").alias("n_pos"),
                   F.count(F.lit(1)).cast("long").alias("n_tot")))
    kept = (scored
            .select("middle",
                    F.expr("n_pos * 1000 div n_tot").cast("long")
                    .alias("pattern_conf"))
            .where(F.col("pattern_conf") >= threshold_permille))
    hits = tagged.join(F.broadcast(kept), "middle")
    seed_subjects = F.broadcast(
        seeds.select(F.col("subject").alias("subject")).distinct()
        .withColumn("__seed", F.lit(True)))
    return (hits.groupBy("subject", "object")
            .agg(F.max("pattern_conf").cast("long")
                 .alias("confidence_permille"),
                 F.count(F.lit(1)).cast("long").alias("n_mentions"))
            .join(seed_subjects, "subject", "left")
            .select("subject", "object", "confidence_permille",
                    "n_mentions",
                    F.coalesce("__seed", F.lit(False))
                    .alias("is_seed_subject")))
