"""Deduplication family over the `documents` table — the large-scale
training-data-pipeline operators (driver mandate; the reference's
analogue is download change-detection / content-diff, SURVEY.md S2).

All variants are pure DataFrame/JVM expressions (no Python UDFs) and
are designed to hold at 10^12 rows:

* :func:`exact_duplicates` — hash-groupBy; one shuffle on a short hash.
* :func:`shingles` / :func:`ngram_jaccard_pairs` — word-n-gram
  shingle explode + self-join on shingle + pair aggregation.  At scale
  the self-join is bounded by dropping ultra-frequent shingles
  (stopword shingles create quadratic hot keys — classic skew).
* :func:`minhash_signatures` / :func:`minhash_band_pairs` — MinHash
  via k seeded md5 min-hashes, banded LSH bucketing; candidate pairs
  only, never the full cross product.
* :func:`simhash` — 16-bit SimHash over a deterministic token hash
  (SQL-expressible on both engines so the oracle can verify it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Explicit whitespace class, NOT \s: Java regex \s includes \x0B
# (vertical tab) while DuckDB/RE2 \s does not, so a corpus row
# containing \x0B would make Spark and the oracle disagree on token
# counts.  Every oracle CTE mirrors this exact class.
TOKEN_SPLIT = "[ \\t\\n\\r\\f\\x0B]+"


def exact_duplicates(documents: DataFrame, prefix_len: int = 40) -> DataFrame:
    """md5 of a text prefix -> (text_md5, n_docs, canonical_doc_id)."""
    return (documents
            .select("doc_id",
                    F.md5(F.substring("text", 1, prefix_len))
                    .alias("text_md5"))
            .groupBy("text_md5")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc_id")))


def tokens(col):
    return F.split(F.lower(F.trim(col)), TOKEN_SPLIT)


def shingle_array(n: int = 3):
    """Distinct word-n-gram shingle array of `text` (map-side column
    expression; empty shingles filtered)."""
    toks = tokens(F.col("text"))
    sh = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))
    return F.filter(sh, lambda s: F.length(s) > 0)


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word-n-gram shingles.  Already
    distinct per doc via array_distinct — no shuffle needed."""
    return documents.select(
        "doc_id", F.explode(shingle_array(n)).alias("shingle"))


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.4,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold.

    Self-join on shingle -> per-pair common count -> Jaccard via the
    per-doc shingle counts.  ``max_shingle_freq`` drops shingles that
    occur in more than that many docs (hot-key/skew guard at scale;
    exactness trade documented — None keeps exact semantics)."""
    sh = shingles(documents, n)
    if max_shingle_freq:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .where(F.col("df") > max_shingle_freq).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_shingles").alias("size_b"))
    return (common.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.col("n_common").cast("double")
                        / (F.col("size_a") + F.col("size_b")
                           - F.col("n_common")))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_common", "jaccard"))


def _hash64_col(sh, num_hashes: int = 8):
    """Hash chain per shingle: md5(s) || md5(md5(s)) || md5^3(s) ...,
    long enough for ``num_hashes`` disjoint 8-hex slices (each md5 round
    yields 32 hex chars = 4 slices; at least 2 rounds are kept for the
    oracle-mirrored default recipe).  One chain per shingle feeds ALL k
    minhashes instead of k independent seeded md5 passes — rounds ≈ k/4
    hashes per shingle, and a much smaller expression tree (plan
    analysis of k nested-lambda md5 trees was the dominant cost)."""
    rounds = max(2, (num_hashes + 3) // 4)

    def chain(s):
        parts, h = [], s
        for _ in range(rounds):
            h = F.md5(h)
            parts.append(h)
        return F.concat(*parts)

    return F.transform(sh, chain)


def _minhash_col(hh, seed: int):
    """min over the per-shingle hash chain of its seed-th 8-hex slice
    — pure map-side, no explode/shuffle."""
    return F.array_min(F.transform(hh, lambda h: h.substr(8 * seed + 1, 8)))


def minhash_signatures(documents: DataFrame, n: int = 3,
                       num_hashes: int = 8) -> DataFrame:
    """(doc_id, seed, minhash): minhash_i = min(md5(i || ':' || shingle)).
    md5-seeded so the oracle reproduces it exactly in SQL.

    Computed as `num_hashes` array_min expressions over the in-row
    shingle-hash array, then unpivoted — the whole signature is one
    narrow map-side pass (the naive shingle-explode x seed-crossJoin
    plan shuffles num_hashes x total-shingle rows; this shuffles
    nothing)."""
    hh = F.col("_hh")
    wide = (documents
            .withColumn("_hh", _hash64_col(shingle_array(n), num_hashes))
            .select("doc_id", *[_minhash_col(hh, i).alias("mh%d" % i)
                                for i in range(num_hashes)]))
    pairs = F.array(*[
        F.struct(F.lit(i).alias("seed"), F.col("mh%d" % i).alias("minhash"))
        for i in range(num_hashes)])
    return (wide.select("doc_id", F.explode(pairs).alias("sm"))
            .select("doc_id", "sm.seed", "sm.minhash")
            .where(F.col("minhash").isNotNull()))


def banded_buckets(documents: DataFrame, n: int = 3,
                   num_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """(doc_id, band, bucket) LSH band buckets — signature AND buckets
    are map-side column expressions, materialized once (the stage-table
    boundary on a cluster: the downstream join must not re-evaluate the
    signature computation on both sides)."""
    hh = F.col("_hh")
    wide = (documents
            .withColumn("_sh", shingle_array(n))
            .where(F.size("_sh") > 0)
            .withColumn("_hh", _hash64_col(F.col("_sh"), num_hashes))
            .select("doc_id", *[_minhash_col(hh, i).alias("mh%d" % i)
                                for i in range(num_hashes)]))
    banded_cols = []
    for band_start in range(0, num_hashes, band_size):
        band = band_start // band_size
        parts = F.array_sort(F.array(*[
            F.concat(F.lit("%d:" % i), F.col("mh%d" % i))
            for i in range(band_start,
                           min(band_start + band_size, num_hashes))]))
        banded_cols.append(F.struct(
            F.lit(band).alias("band"),
            F.md5(F.concat_ws("|", parts)).alias("bucket")))
    return (wide
            .select("doc_id",
                    F.explode(F.array(*banded_cols)).alias("bb"))
            .select("doc_id", "bb.band", "bb.bucket")
            .localCheckpoint())


def minhash_band_pairs(documents: DataFrame, n: int = 3,
                       num_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """LSH banding: bucket = md5(concat of the band's minhashes);
    candidate pairs = docs sharing any (band, bucket).

    The only shuffle is the candidate self-join on (band, bucket) —
    whose key cardinality is docs x num_bands, not shingles.  Hot
    buckets are real duplicate clusters, which is the point."""
    banded = banded_buckets(documents, n, num_hashes, band_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def minhash_incremental_matches(new_docs: DataFrame,
                                base_docs: DataFrame, n: int = 3,
                                num_hashes: int = 8,
                                band_size: int = 2) -> DataFrame:
    """Incremental dedup — the production shape for a growing crawl:
    only the NEW batch is shingled/hashed fresh; the base corpus's
    band buckets are the already-committed signature stage table (the
    sandbox recomputes them from the base frame; on a cluster this
    side is an Iceberg read, never a re-shingle).  One equi-join on
    (band, bucket), batch-side small -> AQE broadcasts it.

    Returns distinct (new_doc, base_doc) candidate near-dup matches;
    a new doc with no row is novel and enters the corpus."""
    nb = banded_buckets(new_docs, n, num_hashes, band_size)
    bb = banded_buckets(base_docs, n, num_hashes, band_size)
    return (nb.alias("n")
            .join(bb.alias("b"),
                  (F.col("n.band") == F.col("b.band"))
                  & (F.col("n.bucket") == F.col("b.bucket")))
            .select(F.col("n.doc_id").alias("new_doc"),
                    F.col("b.doc_id").alias("base_doc"))
            .distinct())


def _token_hash16(col):
    """Deterministic 16-bit token hash expressible in both Spark and
    DuckDB SQL: (7*len + 13*ascii(first) + 31*ascii(last)) % 65536."""
    return ((F.length(col) * 7
             + F.ascii(F.substring(col, 1, 1)) * 13
             + F.ascii(F.substring(col, -1, 1)) * 31) % 65536)


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): majority vote per bit over distinct tokens."""
    tok = (documents
           .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
           .where(F.length("tok") > 0)
           .distinct()
           .withColumn("h", _token_hash16(F.col("tok"))))
    aggs = [F.sum(F.when(F.shiftright("h", b).bitwiseAND(1) == 1, 1)
                  .otherwise(-1)).alias("b%d" % b)
            for b in range(bits)]
    per_doc = tok.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0)
    for b in range(bits):
        sim = sim + F.when(F.col("b%d" % b) > 0, 1 << b).otherwise(0)
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


def dup_clusters(pairs: DataFrame, id_a: str = "doc_a",
                 id_b: str = "doc_b") -> DataFrame:
    """Near-duplicate PAIRS -> duplicate CLUSTERS: connected
    components over the candidate-pair graph (transitive closure —
    A~B, B~C puts A,B,C in one cluster even when A,C never shared a
    bucket), canonical = the minimum doc id per component (the
    keep-one-representative policy a training-data dedup pipeline
    applies before dropping).  Returns (doc_id, canonical_doc_id) for
    every document that appears in at least one pair; untouched
    documents are implicitly their own canon.

    Scale shape: reuses the hash-min fixpoint of
    canonicalize.connected_components — O(cluster diameter) rounds of
    one join + one groupBy over the pair edges, lineage cut per
    round; no driver-side graph."""
    from .canonicalize import connected_components
    edges = pairs.select(F.col(id_a).alias("src"),
                         F.col(id_b).alias("dst"))
    comp = connected_components(edges)
    return comp.select(F.col("vertex").alias("doc_id"),
                       F.col("component").alias("canonical_doc_id"))


def repeated_spans(documents: DataFrame, window: int = 4,
                   min_docs: int = 2) -> DataFrame:
    """Cross-document exact-substring duplicate spans (the
    suffix-array dedup of "Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022, restated as its distributable
    window-hash form; reference analogue: content change detection,
    SURVEY.md S2).

    Pipeline (all JVM expressions, no Python):

    1. tokenize (pinned cross-engine whitespace class) and hash every
       ``window``-token sliding window map-side — md5 so the DuckDB
       oracle can mirror it;
    2. ONE groupBy(hash) with map-side partial aggregation finds
       hashes seen in >= ``min_docs`` distinct docs — at 10^12 rows
       this is the only |tokens|-sized shuffle, and it carries
       (hash, doc_id) pairs only, never text;
    3. positions semi-join the duplicated-hash set (AQE broadcasts it
       when small — the common case after the >=min_docs filter);
    4. overlapping duplicated windows merge into MAXIMAL spans per doc
       (gaps-and-islands: a window whose start is more than ``window``
       past its predecessor opens a new island), partitioned by
       doc_id — no global window.

    Returns (doc_id, span_start, span_end, n_windows): 1-based token
    offsets, span_end inclusive."""
    from pyspark.sql import Window as W

    toks = tokens(F.col("text"))
    wins_expr = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - window + 1),
            lambda i: F.struct(
                i.alias("start"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, window)))
                .alias("h")))
    ).otherwise(F.array().cast(
        "array<struct<start:int,h:string>>"))
    wins = (documents.select("doc_id", F.explode(wins_expr).alias("w"))
            .select("doc_id", F.col("w.start").alias("start"),
                    F.col("w.h").alias("h")))
    dup = (wins.groupBy("h")
           .agg(F.countDistinct("doc_id").alias("n_docs"))
           .where(F.col("n_docs") >= min_docs)
           .select("h"))
    hits = wins.join(dup, "h", "left_semi")
    order = W.partitionBy("doc_id").orderBy("start")
    brk = F.when(
        F.lag("start").over(order).isNull()
        | (F.col("start") - F.lag("start").over(order) > window),
        F.lit(1)).otherwise(F.lit(0))
    islands = (hits.withColumn("brk", brk)
               .withColumn("island",
                           F.sum("brk").over(
                               order.rowsBetween(W.unboundedPreceding,
                                                 W.currentRow))))
    return (islands.groupBy("doc_id", "island")
            .agg(F.min("start").alias("span_start"),
                 (F.max("start") + window - 1).alias("span_end"),
                 F.count("*").alias("n_windows"))
            .drop("island"))


def remove_repeated_spans(documents: DataFrame, window: int = 4,
                          min_docs: int = 2) -> DataFrame:
    """The dedup TRANSFORM over :func:`repeated_spans`: drop every
    token covered by a cross-document duplicated span, in every doc
    (aggressive boilerplate/contamination removal; Lee et al. 2022
    keep-one is a policy layer above — documented choice).

    Per-doc span lists are small (collect_list of (start, end) pairs),
    so the rebuild is a single JVM higher-order-function pass: index
    the token array with a transform lambda, filter positions covered
    by any span, re-join with single spaces.  Reconstruction is
    token-level — original whitespace runs collapse (the standard
    token-dedup contract; byte-exact text keeps flowing through the
    untouched `text` column upstream).

    Returns (doc_id, clean_text, n_removed) for EVERY input doc
    (n_removed = 0 when nothing was cut)."""
    spans = (repeated_spans(documents, window, min_docs)
             .groupBy("doc_id")
             .agg(F.collect_list(
                 F.struct("span_start", "span_end")).alias("spans")))
    joined = documents.select("doc_id", "text").join(
        spans, "doc_id", "left")
    tk = tokens(F.col("text"))
    indexed = F.transform(
        tk, lambda t, i: F.struct(t.alias("t"),
                                  (i + 1).alias("pos")))
    kept = F.filter(
        indexed,
        lambda x: F.col("spans").isNull()
        | ~F.exists("spans",
                    lambda s: (x["pos"] >= s["span_start"])
                    & (x["pos"] <= s["span_end"])))
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda x: x["t"]), " ")
        .alias("clean_text"),
        (F.size(tk) - F.size(kept)).alias("n_removed"))


def edit_verified_pairs(documents: DataFrame, n: int = 3,
                        num_hashes: int = 8, band_size: int = 2,
                        min_sim: float = 0.8) -> DataFrame:
    """Candidate verification — the second half of a production
    near-dup pipeline: LSH banding proposes pairs cheaply
    (:func:`minhash_band_pairs`) and an EXACT normalized edit
    distance confirms them, rejecting banding's hash-collision false
    positives before they merge distinct documents.  edit_sim =
    1 - levenshtein / max(len) (1.0 when both texts are empty),
    kept iff >= `min_sim`.

    Scale shape: text shuffles only for the candidate pairs (two
    joins keyed on doc id — candidate count is bounded by the band
    design, orders of magnitude below the pair square), and the
    O(len^2) Levenshtein kernel runs JVM-side per surviving pair
    only.  Never used on the raw corpus square.

    Returns (doc_a, doc_b, edit_dist, edit_sim) verified pairs."""
    cand = minhash_band_pairs(documents, n, num_hashes, band_size)
    ta = documents.select(F.col("doc_id").alias("doc_a"),
                          F.col("text").alias("text_a"))
    tb = documents.select(F.col("doc_id").alias("doc_b"),
                          F.col("text").alias("text_b"))
    sim = F.when(
        F.greatest(F.length("text_a"), F.length("text_b")) == 0,
        F.lit(1.0)
    ).otherwise(F.round(
        1 - F.levenshtein("text_a", "text_b")
        / F.greatest(F.length("text_a"), F.length("text_b")), 6))
    return (cand.join(ta, "doc_a").join(tb, "doc_b")
            .select("doc_a", "doc_b",
                    F.levenshtein("text_a", "text_b").alias("edit_dist"),
                    sim.alias("edit_sim"))
            .where(F.col("edit_sim") >= min_sim))


def minhash_estimated_jaccard(documents: DataFrame, n: int = 3,
                              num_hashes: int = 8,
                              band_size: int = 2) -> DataFrame:
    """Signature-only verification of LSH candidates: the estimated
    Jaccard of a pair = the fraction of its minhash components that
    agree (the unbiased MinHash estimator) — verification WITHOUT
    ever touching text, the cheap middle tier between raw banding
    and the exact edit-distance confirmation
    (:func:`edit_verified_pairs`).

    Scale shape: candidates from the banded self-join; the component
    comparison joins the (doc, seed, minhash) signature table on the
    doc id — two signature-sized keyed joins, text never shuffles,
    signature width is num_hashes rows per doc.

    ``est_jaccard_ppm`` is integer parts-per-million
    (``n_agree * 1_000_000 div num_hashes`` as long) — no float ever
    appears, so Spark and any SQL oracle agree bit-for-bit (the
    repo-wide integer-ppm convention; a float here burned two
    correctness rounds).

    Returns (doc_a, doc_b, n_agree, est_jaccard_ppm) for every
    candidate pair."""
    cand = minhash_band_pairs(documents, n, num_hashes, band_size)
    sig = minhash_signatures(documents, n, num_hashes)
    sa = sig.select(F.col("doc_id").alias("doc_a"), "seed",
                    F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), "seed",
                    F.col("minhash").alias("mh_b"))
    return (cand.join(sa, "doc_a").join(sb, ["doc_b", "seed"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum((F.col("mh_a") == F.col("mh_b")).cast("long"))
                 .alias("n_agree"))
            .select("doc_a", "doc_b", "n_agree",
                    F.expr(f"n_agree * 1000000L div {num_hashes}")
                    .alias("est_jaccard_ppm")))


def cluster_representatives(clusters: DataFrame, documents: DataFrame,
                            quality_col: str = "n_chars") -> DataFrame:
    """Keep-one selection per near-dup cluster: among a cluster's
    members the highest-quality document survives (ties -> lowest
    doc_id), everything else is dropped — the final decision step of
    a production dedup pipeline (run AFTER dup_clusters, BEFORE the
    training-set write).

    ``clusters``: (doc_id, canonical_doc_id) from :func:`dup_clusters`.
    Quality defaults to document length; callers pass a model score
    column when they have one.  One doc-keyed join to fetch the
    quality signal + one window per cluster (bounded by cluster
    size).  Returns (cluster_id, kept_doc_id, kept_quality,
    n_members)."""
    from pyspark.sql import Window
    q = documents.select("doc_id",
                         F.col(quality_col).cast("long").alias("quality"))
    m = clusters.join(q, "doc_id")
    w = Window.partitionBy("canonical_doc_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc())
    return (m.withColumn("rk", F.row_number().over(w))
            .groupBy(F.col("canonical_doc_id").alias("cluster_id"))
            .agg(F.max(F.when(F.col("rk") == 1, F.col("doc_id")))
                 .alias("kept_doc_id"),
                 F.max(F.when(F.col("rk") == 1, F.col("quality")))
                 .alias("kept_quality"),
                 F.count(F.lit(1)).cast("long").alias("n_members")))


def er_pairwise_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Pairwise entity-resolution evaluation (the standard ER metric,
    e.g. Menestrina et al. 2010): treat every co-clustered item pair
    as a decision and score predicted vs gold clusterings with
    pairwise precision / recall / F1 — how the MinHash/SNM dedup
    output gets graded against labeled duplicates.

    Both inputs are (item, cluster).  Pairs are materialized by a
    cluster-keyed self-join with item_a < item_b, so cost is
    sum-over-clusters of size² — quadratic in the LARGEST cluster
    only (the usual caveat; a runaway mega-cluster should be capped
    upstream, cf. dup_clusters).  tp = one (a,b)-keyed join between
    the two pair sets; fp/fn fall out of the counts.  Returns one row
    (tp, fp, fn, precision, recall, f1) — division expressions are
    written once and mirrored verbatim in the oracle so the doubles
    are bit-identical."""
    def _pairs(df):
        a = df.select(F.col("cluster"), F.col("item").alias("a"))
        b = df.select(F.col("cluster"), F.col("item").alias("b"))
        return (a.join(b, "cluster")
                .where(F.col("a") < F.col("b"))
                .select("a", "b"))
    pp = _pairs(pred).withColumn("in_p", F.lit(1))
    gp = _pairs(gold).withColumn("in_g", F.lit(1))
    j = pp.join(gp, ["a", "b"], "full_outer")
    agg = j.agg(
        F.sum(F.when(F.col("in_p").isNotNull()
                     & F.col("in_g").isNotNull(), 1).otherwise(0))
        .cast("long").alias("tp"),
        F.sum(F.coalesce("in_p", F.lit(0))).cast("long").alias("n_pred"),
        F.sum(F.coalesce("in_g", F.lit(0))).cast("long").alias("n_gold"))
    tp, np_, ng = F.col("tp"), F.col("n_pred"), F.col("n_gold")
    prec = F.when(np_ > 0, tp / np_).otherwise(F.lit(0.0))
    rec = F.when(ng > 0, tp / ng).otherwise(F.lit(0.0))
    return agg.select(
        "tp", (np_ - tp).alias("fp"), (ng - tp).alias("fn"),
        prec.alias("precision"), rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0)).alias("f1"))


def paragraph_dedup(documents: DataFrame, text_col: str = "text",
                    id_col: str = "url") -> DataFrame:
    """Cross-document paragraph-level exact dedup, keep-first — the
    corpus-cleaning step CCNet / RefinedWeb run before document-level
    LSH (boilerplate paragraphs repeat across a site far more often
    than whole pages do).  A paragraph survives only in the
    lexicographically-first document that contains it (first
    occurrence within that document when repeated); every other copy
    is dropped and the document is reassembled from its surviving
    paragraphs in original order.

    Shape: posexplode on the blank-line split (one UDTF-shaped
    map-side explode), one md5 groupBy-min to elect each paragraph
    hash's owner ((id, pos) packed so min() is the single aggregate
    — no window over the full corpus), one hash-keyed semi-join back,
    and one per-document sort-agg to reassemble.  Everything keys on
    the 32-hex md5, so at 10^12 documents the election is a plain
    hash aggregate with map-side partial min; no global ordering is
    ever materialized.  Returns (id, n_paras, n_kept, kept_text) with
    kept_text NULL when nothing survives."""
    paras = (documents.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\n{2,}"))
        .alias("pos", "para"))
        .where(F.trim(F.col("para")) != "")
        .select("id", "pos", F.md5(F.col("para")).alias("ph"),
                "para"))
    # owner of a paragraph hash = min (id, pos) pair, packed as a
    # single sortable string so one MIN aggregate elects it
    owner = (paras.groupBy("ph")
             .agg(F.min(F.concat_ws(
                 "\x00", F.col("id"),
                 F.lpad(F.col("pos").cast("string"), 9, "0")))
                 .alias("winner")))
    kept = (paras.join(owner, "ph")
            .where(F.concat_ws(
                "\x00", F.col("id"),
                F.lpad(F.col("pos").cast("string"), 9, "0"))
                == F.col("winner")))
    stats = (paras.groupBy("id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_paras")))
    kept_agg = (kept.groupBy("id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                     F.concat_ws(
                         "\n\n",
                         F.array_sort(F.collect_list(
                             F.struct("pos", "para"))).getField("para"))
                     .alias("kept_text")))
    return (stats.join(kept_agg, "id", "left")
            .select(F.col("id").alias(id_col), "n_paras",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"), "kept_text"))


def winnow_fingerprints(documents: DataFrame, k: int = 3,
                        w: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every ``k``-token gram,
    slide a window of ``w`` consecutive gram hashes, and select the
    *rightmost minimal* hash of each window.  The guarantee: any
    shared run of ``w + k - 1`` tokens between two documents yields
    at least one shared fingerprint, with expected density 2/(w+1) —
    position-robust partial-overlap detection, complementing the
    exact-span (:func:`repeated_spans`) and set-similarity
    (:func:`minhash_signatures`) families.

    Returns (doc_id, pos, fingerprint): 1-based gram position and the
    first 8 md5 hex digits of the selected gram.

    Scale shape: grams and window replication (×w) are map-side
    expressions; selection is ONE groupBy keyed on (doc, window) —
    never coarser than a document — followed by a per-doc distinct.
    The rightmost-min rule needs min-by-(hash, -pos); that composite
    is encoded as a plain string key (md5 hex ∥ zero-padded reversed
    position) so the aggregation is a vanilla ``min`` that the DuckDB
    oracle replays verbatim — no engine-specific arg_min semantics.
    """
    toks = tokens(F.col(text_col))
    m = F.size(toks) - k + 1        # number of k-grams
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, k)))
                .alias("h")))
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    rows = (documents
            .select("doc_id", m.alias("m"),
                    F.explode(grams).alias("g"))
            .select("doc_id", "m", F.col("g.pos").alias("pos"),
                    F.col("g.h").alias("h")))
    # window starts this gram participates in: [pos-w+1, pos] ∩ [1, m-w+1]
    starts = F.sequence(F.greatest(F.lit(1), F.col("pos") - w + 1),
                        F.least(F.col("pos"), F.col("m") - w + 1))
    rows = (rows.where(F.col("m") >= w)
            .select("doc_id", "pos", "h",
                    F.explode(starts).alias("win")))
    # min over (h asc, pos desc): reversed-position suffix makes the
    # lexicographic min of the composite key pick the rightmost
    # minimal hash (md5 hex is fixed-width, so lex = numeric)
    key = F.concat(F.col("h"),
                   F.lpad((F.lit(999999999) - F.col("pos"))
                          .cast("string"), 9, "0"))
    sel = (rows
           .groupBy("doc_id", "win")
           .agg(F.min(key).alias("k")))
    return (sel
            .select("doc_id",
                    (F.lit(999999999)
                     - F.substring("k", 33, 9).cast("int")).alias("pos"),
                    F.substring("k", 1, 8).alias("fingerprint"))
            .distinct())


def meta_blocking_pairs(documents: DataFrame, n: int = 2,
                        max_block: int = 20) -> DataFrame:
    """Meta-blocking for entity resolution (Papadakis et al., TKDE
    2014): token blocking -> block purging -> common-blocks-scheme
    edge weighting -> weighted node pruning (WNP).  The production
    answer to "blocking alone still yields O(|block|^2) junk
    comparisons": build the comparison graph IMPLICITLY, weight each
    candidate pair by its number of shared blocks (CBS), and keep a
    pair only if its weight reaches the mean incident weight of at
    least one endpoint — pruning the long tail of coincidental
    co-occurrences before any expensive matcher runs.

    Stages (each one keyed shuffle, nothing quadratic in docs):
    1. blocks: distinct (doc_id, word-``n``-gram) — map-side.
    2. purging: drop blocks of size < 2 (no pairs) or > ``max_block``
       (stop-word-like keys whose |b|^2 fan-out would dominate cost
       while carrying no resolution signal — the hot-shingle guard of
       ngram_jaccard_pairs, same rationale).
    3. CBS: block self-join on the key (fan-out bounded by
       ``max_block``), one (a, b) groupBy counting shared blocks.
    4. WNP: per-node mean incident CBS via one explode + groupBy;
       keep (a, b) iff cbs >= mean(a) OR cbs >= mean(b).

    Mean comparison is exact across engines: sum of longs is exact,
    one IEEE division is correctly rounded — no float accumulation.

    Returns (doc_a, doc_b, cbs) for KEPT pairs, doc_a < doc_b."""
    keys = shingles(documents, n).withColumnRenamed("shingle", "bkey")
    sizes = keys.groupBy("bkey").agg(F.count(F.lit(1)).alias("bsz"))
    ok = sizes.where((F.col("bsz") >= 2) & (F.col("bsz") <= max_block))
    kb = keys.join(ok.select("bkey"), "bkey")
    lhs = kb.select("bkey", F.col("doc_id").alias("a"))
    rhs = kb.select("bkey", F.col("doc_id").alias("b"))
    pairs = (lhs.join(rhs, "bkey")
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("cbs")))
    incident = (pairs.select(F.col("a").alias("node"), "cbs")
                .unionByName(pairs.select(F.col("b").alias("node"),
                                          "cbs")))
    means = incident.groupBy("node").agg(F.avg("cbs").alias("thr"))
    ma = means.select(F.col("node").alias("a"), F.col("thr").alias("_ta"))
    mb = means.select(F.col("node").alias("b"), F.col("thr").alias("_tb"))
    return (pairs.join(ma, "a").join(mb, "b")
            .where((F.col("cbs") >= F.col("_ta")) |
                   (F.col("cbs") >= F.col("_tb")))
            .select(F.col("a").alias("doc_a"),
                    F.col("b").alias("doc_b"), "cbs"))


def containment_pairs(documents: DataFrame, n: int = 3,
                      threshold: float = 0.5,
                      max_shingle_freq: int = 100) -> DataFrame:
    """Asymmetric shingle containment (Broder 1997's second resemblance
    measure): c(A -> B) = |S(A) ∩ S(B)| / |S(A)| — the quote/subset
    detector symmetric Jaccard misses: a 50-token excerpt inside a
    5000-token page has Jaccard ~0.01 but containment ~1.0.  In a
    training-data pipeline this is the "document is a near-subset of
    another" dedup rule (keep the superset, drop the excerpt).

    Same bounded machinery as ngram_jaccard_pairs: distinct shingles,
    hot-shingle guard (> ``max_shingle_freq`` docs), one shingle-keyed
    self-join counted per unordered pair, then BOTH directed rows are
    emitted with each side's own size as denominator.  |S(A)| is the
    guarded size (consistent numerator/denominator, mirrored in the
    oracle).

    Returns (doc_a, doc_b, n_common, containment) for ORDERED pairs
    with containment >= threshold, doc_a != doc_b."""
    sh = shingles(documents, n)
    hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
           .where(F.col("_f") > max_shingle_freq).select("shingle"))
    shg = sh.join(hot, "shingle", "left_anti")
    sizes = shg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = shg.select("shingle", F.col("doc_id").alias("da"))
    b = shg.select("shingle", F.col("doc_id").alias("db"))
    common = (a.join(b, "shingle")
              .where(F.col("da") < F.col("db"))
              .groupBy("da", "db")
              .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    directed = (common.select(F.col("da").alias("doc_a"),
                              F.col("db").alias("doc_b"), "n_common")
                .unionByName(
                    common.select(F.col("db").alias("doc_a"),
                                  F.col("da").alias("doc_b"),
                                  "n_common")))
    return (directed
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("_sz")), "doc_a")
            .select("doc_a", "doc_b", "n_common",
                    F.round(F.col("n_common")
                            / F.col("_sz").cast("double"), 6)
                    .alias("containment"))
            .where(F.col("containment") >= threshold))


def cdc_chunks(documents: DataFrame, window: int = 8,
               mask: int = 63, min_docs: int = 2,
               doc_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Content-defined chunking dedup (the Rabin/FastCDC family —
    LBFS, Muthitacharoen et al. 2001): cut each document wherever the
    rolling hash of the last ``window`` characters hits
    ``h % (mask+1) == 0`` (expected chunk = mask+1 chars), hash each
    chunk, and report chunks shared across documents.  Content-
    defined cuts SELF-SYNCHRONIZE: an insertion early in a document
    shifts every byte offset, but boundaries inside unchanged text
    realign within one window — which is exactly what fixed-size
    blocks can't do and why every dedup store (and the
    shared-boilerplate hunt in a web corpus) cuts this way.

    Distributed restatement of the inherently-sequential scan: the
    polynomial hash h(p) = sum_k code(p-k)*31^k unrolls into a
    bounded ``window``-way explode (each char contributes to the
    ``window`` positions it is visible from) plus ONE (doc, pos)
    groupBy — no sequential state.  No min/max chunk-size clamp (the
    sequential part of real CDC) — declared gear-less variant.
    Chunk ids are a per-doc cumulative boundary count (one doc-keyed
    window), reassembly is a per-chunk sorted collect bounded by
    chunk length, and the final stats are one md5-keyed aggregate.
    Every number is an exact long (31^7 * 255 * 8 << 2^63).

    Returns (chunk_md5, chunk_len, n_docs, n_occurrences) for chunks
    seen in at least ``min_docs`` documents."""
    from pyspark.sql import Window
    base = documents.select(F.col(doc_col).alias("doc"),
                            F.col(text_col).alias("t"))
    chars = (base
             .select("doc", "t", F.length("t").alias("n"),
                     F.explode(F.sequence(F.lit(1), F.length("t")))
                     .alias("i"))
             .select("doc", "n", "i",
                     F.expr("substring(t, i, 1)").alias("ch"))
             .withColumn("code", F.ascii("ch")))
    ks = F.array(*[F.struct(F.lit(k).alias("k"),
                            F.lit(31 ** k).alias("w"))
                   for k in range(window)])
    contrib = (chars
               .select("doc", "n", "i", "code",
                       F.explode(ks).alias("kw"))
               .select("doc", "n",
                       (F.col("i") + F.col("kw.k")).alias("p"),
                       (F.col("code") * F.col("kw.w")).alias("term"))
               .where(F.col("p") <= F.col("n")))
    h = (contrib.groupBy("doc", "p")
         .agg(F.sum("term").cast("long").alias("h"))
         .select(F.col("doc").alias("hdoc"), "p", "h"))
    marked = (chars.join(h, (chars["doc"] == F.col("hdoc"))
                         & (chars["i"] == F.col("p")))
              .select("doc", "i", "ch",
                      (F.col("h") % (mask + 1) == 0).alias("is_b")))
    w = (Window.partitionBy("doc").orderBy("i")
         .rowsBetween(Window.unboundedPreceding, -1))
    withid = marked.select(
        "doc", "i", "ch",
        F.coalesce(F.sum(F.col("is_b").cast("long")).over(w),
                   F.lit(0)).alias("chunk_id"))
    chunks = (withid.groupBy("doc", "chunk_id")
              .agg(F.array_join(
                  F.transform(
                      F.array_sort(F.collect_list(
                          F.struct("i", "ch"))),
                      lambda s: s["ch"]), "").alias("content")))
    return (chunks
            .select("doc", F.md5("content").alias("chunk_md5"),
                    F.length("content").cast("long")
                    .alias("chunk_len"))
            .groupBy("chunk_md5", "chunk_len")
            .agg(F.countDistinct("doc").cast("long").alias("n_docs"),
                 F.count(F.lit(1)).cast("long")
                 .alias("n_occurrences"))
            .where(F.col("n_docs") >= min_docs))
