"""Search query compiler — the REST API surface (SURVEY.md §2.8).

Compiles the reference's query parameters (wsgiapp.py:547-667 +
fulltextindex.py:496-945) into DataFrame filters / scoring / paging:

* Q1 free text: AND of all query terms over the text field(s)
  (ES simple_query_string default_operator=and, fulltextindex.py:884);
* Q2 equality / Q3 wildcard / Q4-Q5 ranges (`year-F=2013` is
  *exclusive* bounds: > Dec 31 of y-1 and < Jan 1 of y+1,
  wsgiapp.py:566-597 — replicated exactly);
* Q8 boosts: score = sum of per-field boost * match indicator
  (title 4, identifier 16, text 1 — facet.py:449-470), min_score
  drops filter-only matches;
* Q7 pagination: 0-based _page/_pageSize over a deterministic order
  (score desc, uri asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens

FIELD_BOOSTS = {"title": 4.0, "identifier": 16.0, "text": 1.0}


def _term_match(col, term):
    return F.lower(col).contains(term.lower())


def compile_query(df: DataFrame, q: str | None = None,
                  filters: dict | None = None,
                  ranges: dict | None = None,
                  wildcard: dict | None = None,
                  boosts: dict | None = None,
                  min_score: float = 0.0,
                  page: int = 0, page_size: int = 10,
                  id_col: str = "uri",
                  text_fields: tuple = ("text",)) -> DataFrame:
    """Compile a search into filter + score + page.  Returns the page
    rows with a ``score`` column, ordered (score desc, id asc)."""
    out = df
    # Q2 field equality (Resource fields match on .iri, J9: pass
    # 'field.iri' as the key)
    for k, v in (filters or {}).items():
        out = out.where(F.col(k) == F.lit(v))
    # Q3 wildcard -> rlike with escaped specials, '*' -> '.*'
    for k, pat in (wildcard or {}).items():
        rx = "^%s$" % (pat.replace(".", r"\.").replace("#", r"\#")
                       .replace("*", ".*"))
        out = out.where(F.col(k).rlike(rx))
    # Q4/Q5 ranges: dict of col -> (op, value); year op uses exclusive
    # bounds per wsgiapp.py:566-597
    for k, (op, v) in (ranges or {}).items():
        if op == "min":
            out = out.where(F.col(k) > F.lit(v))
        elif op == "max":
            out = out.where(F.col(k) < F.lit(v))
        elif op == "year":
            out = out.where((F.col(k) > F.lit("%d-12-31" % (v - 1)))
                            & (F.col(k) < F.lit("%d-01-01" % (v + 1))))
    # Q1 free text: every term must match at least one text field
    terms = (q or "").split()
    for t in terms:
        cond = None
        for f_ in text_fields:
            c = _term_match(F.col(f_), t)
            cond = c if cond is None else (cond | c)
        out = out.where(cond)
    # Q8 scoring
    boosts = boosts or {k: v for k, v in FIELD_BOOSTS.items()
                        if k in df.columns}
    score = F.lit(0.0)
    for fld, w in boosts.items():
        for t in terms:
            score = score + F.when(_term_match(F.col(fld), t),
                                   F.lit(float(w))).otherwise(F.lit(0.0))
    out = out.withColumn("score", score)
    if min_score > 0:
        out = out.where(F.col("score") > min_score)
    # Q7 pagination: deterministic total order, then offset/limit
    out = out.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return out.offset(page * page_size).limit(page_size)


def autocomplete(df: DataFrame, prefix: str, label_col: str,
                 limit: int = 10, id_col: str = "uri") -> DataFrame:
    """Q10: _ac=true variant — startswith on label fields."""
    return (df.where(F.lower(F.col(label_col))
                     .startswith(prefix.lower()))
            .orderBy(label_col, id_col)
            .limit(limit))


def ranked_set_baseline(documents: DataFrame, needs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        limit: int = 20) -> DataFrame:
    """Keyterm-search ranking baseline — graphanalyze's
    eval_get_ranked_set_baseline restated (reference
    sources/general/graphanalyze.py:926-977): each information need
    carries a keyterm set; candidate documents are those matching ANY
    keyterm (the reference's whoosh ``query.Or``); candidates are
    ranked by score descending into a per-need ranked set, the
    baseline that its AP/MAP study compares graph-derived rankings
    against (plug the output straight into
    :func:`operators.graphs.average_precision`).

    Scoring: sum over keyterms of the term's occurrence count in the
    document (the tf core of the reference's BM25F, expressed as an
    engine-portable split-count).  The full BM25F normalization is
    whoosh-internal, the same way ES's scorer is internal to the Q8
    search surface — the deterministic tf-coordination score keeps
    the ranked set reproducible and oracle-verifiable.

    ``needs``: (query, term) rows.  Returns (query, item, rank,
    score), ranks 1-based, top ``limit`` per need.

    Scale shape: the needs table is dimension-sized and broadcast;
    tf is a map-side expression over the corpus scan; one aggregation
    shuffles (query, doc) partial scores with map-side combine; the
    per-need top-``limit`` window is bounded by candidate counts."""
    from pyspark.sql import Window

    txt = F.lower(F.col(text_col))
    term = F.lower(F.col("term"))
    tf = (F.size(F.split(txt, term)) - 1).cast("long")
    scored = (documents.select(id_col, text_col)
              .crossJoin(F.broadcast(needs.select("query", "term")))
              .select("query", F.col(id_col).cast("string").alias("item"),
                      tf.alias("tf"))
              .groupBy("query", "item")
              .agg(F.sum("tf").alias("score"))
              .where(F.col("score") > 0))
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("item"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= limit)
            .select("query", "item", "rank", "score"))


def bm25_rank(documents: DataFrame, needs: DataFrame,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              limit: int = 20) -> DataFrame:
    """Full BM25 ranking (Robertson/Sparck Jones, the scorer behind
    the reference's whoosh/ES search surface, SURVEY.md Q8): exact
    token tf, Lucene-form nonnegative idf
    ln(1 + (N - df + 0.5)/(df + 0.5)), and the k1/b length
    normalization against the corpus mean document length —
    upgrading :func:`ranked_set_baseline`'s tf core to the real
    scoring function, still engine-portable (scores rounded to 6).

    ``needs``: (query, term) rows.  Returns (query, item, rank,
    score), ranks 1-based by score desc (item tie-break), top
    ``limit`` per need.

    Scale shape: the distinct-term table is dimension-sized and
    broadcast against the corpus scan; tf is a map-side array filter
    (no explode of the token stream); df and the corpus stats are
    one groupBy / one 1-row broadcast aggregate; the only per-doc
    shuffle keys on (query, doc) partial scores with map-side
    combine; the per-need top-limit window is candidate-bounded."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    docs = documents.select(F.col(id_col).alias("doc_id"),
                            toks.alias("tk"))
    docs = docs.select("doc_id", "tk", F.size("tk").alias("dl"))
    stats = docs.agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    tdist = needs.select(F.lower(F.col("term")).alias("term")).distinct()
    tf = (docs.crossJoin(F.broadcast(tdist))
          .select("doc_id", "dl", "term",
                  F.size(F.filter(
                      F.col("tk"),
                      lambda x: x == F.col("term"))).alias("tf"))
          .where(F.col("tf") > 0))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(F.broadcast(df_t), "term")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", "term", "tf", "dl",
                      (F.log(1 + (F.col("n_docs") - F.col("df") + 0.5)
                             / (F.col("df") + 0.5))
                       * (F.col("tf") * (k1 + 1))
                       / (F.col("tf")
                          + k1 * (1 - b + b * F.col("dl")
                                  / F.col("avgdl")))).alias("s")))
    per_q = (scored.join(
        F.broadcast(needs.select("query",
                                 F.lower(F.col("term")).alias("term"))),
        "term")
        .groupBy("query", F.col("doc_id").cast("string").alias("item"))
        .agg(F.round(F.sum("s"), 6).alias("score")))
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("item"))
    return (per_q.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= limit)
            .select("query", "item", "rank", "score"))


def rocchio_expansion(documents: DataFrame, needs: DataFrame,
                      top_docs: int = 5, top_terms: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio reduced to
    a pinned deterministic spec): take each need's BM25 top
    ``top_docs`` documents as the feedback set, pool their tokens,
    drop the original query terms and stopwords, and propose the
    ``top_terms`` candidates ranked by **(feedback frequency DESC,
    corpus document frequency ASC, term ASC)** -- frequent where the
    query matched, rare elsewhere.  The all-integer ranking key (no
    tf-idf float product) makes the expansion reproducible
    bit-for-bit on any engine; the BM25 feedback set is itself
    deterministic (scores rounded to 6, item tie-break).

    Scale shape: the feedback pool is |queries| x top_docs documents
    (tiny); the corpus-df pass joins the candidate vocabulary
    (broadcast) against the token arrays map-side -- the same shape
    as the BM25 tf pass.  Returns (query, term, total_tf, df, rank).
    """
    from pyspark.sql import Window

    from .textstats import RAKE_STOPWORDS
    fb = (bm25_rank(documents, needs, text_col=text_col,
                    id_col=id_col, limit=int(top_docs))
          .select("query", "item"))
    docs = documents.select(
        F.col(id_col).cast("string").alias("item"),
        tokens(F.col(text_col)).alias("tk"))
    cand = (fb.join(docs, "item")
            .select("query", F.explode("tk").alias("term"))
            .where((F.col("term") != "")
                   & ~F.col("term").isin(*RAKE_STOPWORDS)))
    qterms = needs.select("query", F.lower(F.col("term")).alias("term"))
    cand = cand.join(qterms, ["query", "term"], "left_anti")
    tfq = cand.groupBy("query", "term").agg(
        F.count(F.lit(1)).cast("long").alias("total_tf"))
    vocab = tfq.select("term").distinct()
    dft = (docs.crossJoin(F.broadcast(vocab))
           .where(F.array_contains("tk", F.col("term")))
           .groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("df")))
    w = Window.partitionBy("query").orderBy(
        F.col("total_tf").desc(), F.col("df"), F.col("term"))
    return (tfq.join(dft, "term")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= int(top_terms))
            .select("query", "term", "total_tf", "df", "rank"))


def phrase_search(documents: DataFrame, phrase: str,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase query over a positional token index — the search
    feature the reference's ES backend gets from match_phrase
    (fulltextindex.py's quoted-query path) re-expressed as column
    algebra over the pinned tokenizer.

    A document matches when the phrase's token sequence occurs as a
    CONSECUTIVE run.  Occurrences are counted positionally (window
    slide of 1), so overlapping runs each count: "batch batch batch"
    contains "batch batch" twice — a substring replace() count would
    say once, which is why the oracle mirrors the positional scan,
    not a string hack.

    Distributed shape: tokenization and the O(n_positions * k)
    window-equality scan are pure per-row JVM expressions inside one
    whole-stage-codegen map — no shuffle, no UDF, no index build.
    At 10^12 docs this is a scan that AQE parallelizes trivially;
    a serving deployment would materialize the same (token,
    position) pairs as an inverted index, but the batch analytics
    contract here is matching, and for that the scan IS the right
    plan (one pass, no join).

    Returns (doc_id, n_occurrences, first_pos) for matching docs
    only; first_pos is 1-based.
    """
    ptoks = [t for t in phrase.lower().split() if t]
    k = len(ptoks)
    if k == 0:
        raise ValueError("empty phrase")
    parr = F.array(*[F.lit(t) for t in ptoks])
    t = F.filter(tokens(F.col(text_col)), lambda s: s != "")
    # sequence(1, 0) DESCENDS in Spark, so short docs need the guard
    starts = F.when(F.size(t) >= k,
                    F.sequence(F.lit(1), F.size(t) - k + 1)
                    ).otherwise(F.array().cast("array<int>"))
    hits = F.filter(starts, lambda i: F.slice(t, i, k) == parr)
    return (documents
            .select(F.col(id_col).alias("doc_id"),
                    F.size(hits).cast("long").alias("n_occurrences"),
                    F.element_at(hits, 1).cast("long")
                    .alias("first_pos"))
            .where(F.col("n_occurrences") > 0))


def fuzzy_lookup(vocab: DataFrame, queries: DataFrame,
                 term_col: str = "term", freq_col: str = "freq",
                 query_col: str = "query") -> DataFrame:
    """Edit-distance-1 dictionary lookup via the SymSpell
    delete-neighborhood join (Garbe's symmetric delete algorithm):
    the spell-correction / query-suggestion primitive behind
    "did you mean" at web scale.

    Why not a similarity cross join: vocab x queries with a
    levenshtein predicate is |V|*|Q| distance computations — dead at
    10^8 terms.  The symmetric-delete identity says two strings are
    within edit distance 1 iff they share a key in {s} U
    {s minus one char} (covers insert, delete, substitute — equal
    deletes at the same index), so BOTH sides explode to at most
    len+1 keys and the candidate set comes from an equi-join on the
    key — the same bucket-join shape as MinHash-LSH, shuffling
    O(total chars), not O(|V|*|Q|).  Candidates are then verified
    with the exact levenshtein (built-in, JVM-side), which kills the
    false positives the key join admits (two different deletes of
    the same key).

    Ranking per query: distance ASC, vocab frequency DESC, term ASC
    — the standard SymSpell suggestion order.  Only the best row per
    query survives (rank 1).

    Returns (query, term, distance, freq) — at most one row per
    query; queries with no candidate within distance 1 are dropped.
    """
    def deletes(col):
        # the string itself (distance-0 key) plus every 1-char
        # deletion, deduped (repeated chars give equal deletes)
        return F.array_distinct(F.concat(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, 1, (i - 1).cast("int")),
                    F.col("__c").substr(i + 1, F.length(col))))))

    v = (vocab.select(F.col(term_col).alias("term"),
                      F.col(freq_col).alias("freq"),
                      F.col(term_col).alias("__c"))
         .select("term", "freq",
                 F.explode(deletes(F.col("__c"))).alias("key")))
    q = (queries.select(F.col(query_col).alias("query"),
                        F.col(query_col).alias("__c"))
         .select("query",
                 F.explode(deletes(F.col("__c"))).alias("key")))
    cand = (v.join(q, "key")
            .select("query", "term", "freq").distinct()
            .withColumn("distance",
                        F.levenshtein("query", "term").cast("long"))
            .where(F.col("distance") <= 1))
    from pyspark.sql import Window
    w = Window.partitionBy("query").orderBy(
        F.col("distance"), F.col("freq").desc(), F.col("term"))
    return (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("query", "term", "distance",
                    F.col("freq").cast("long").alias("freq")))


def more_like_this(documents: DataFrame, seed_ids: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   max_df: int = 100, top_k: int = 5) -> DataFrame:
    """More-like-this retrieval (the ES/Lucene MLT feature): given
    seed documents, rank other documents by the rarity-weighted
    overlap of their vocabularies.  Each shared term contributes
    ``1_000_000 div df`` micro-units (exact integer rarity weight;
    declared deviation from Lucene's float idf = ln(N/df) — ln is
    not correctly rounded and Java/C disagree on it, 1/df preserves
    the rarity ORDER exactly and keeps every engine hash-identical).

    The df cap is load-bearing, not cosmetic: terms with
    ``df > max_df`` are dropped BEFORE the posting join (Lucene MLT's
    max_doc_freq), which is what bounds the join fan-out — a
    stopword appearing in every doc would otherwise join seeds
    against the whole corpus.  With the cap, the candidate join is
    |seed terms| x bounded posting lists, keyed on the term — the
    same bucketed-join discipline as MinHash-LSH.

    Returns (seed_id, doc_id, n_shared_terms, score_micro, rank) —
    top_k per seed by (score desc, doc_id asc); the seed itself is
    excluded.
    """
    from pyspark.sql import Window
    from .dedup import tokens
    posting = (documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            F.filter(tokens(F.col(text_col)), lambda s: s != "")))
        .alias("term")))
    dfreq = (posting.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df"))
             .where(F.col("df") <= int(max_df)))
    posting = posting.join(dfreq, "term")
    seeds = (posting.join(
        seed_ids.select(F.col(seed_ids.columns[0]).alias("doc_id")),
        "doc_id")
        .select(F.col("doc_id").alias("seed_id"), "term"))
    pairs = (seeds.join(posting, "term")
             .where(F.col("seed_id") != F.col("doc_id"))
             .groupBy("seed_id", "doc_id")
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("n_shared_terms"),
                  F.sum(F.expr("1000000 div df")).cast("long")
                  .alias("score_micro")))
    w = Window.partitionBy("seed_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (pairs.withColumn("rank",
                             F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= int(top_k)))


def rrf_fusion(rankings: DataFrame, k: int = 60,
               top_k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): merge
    several rankings of the same query into one, scoring each item
    ``sum over rankings of 1 / (k + rank)`` — the standard
    score-free fusion for hybrid retrieval (BM25 + dense, or any
    ranker ensemble), robust because it never compares raw scores
    across rankers.  Kept integer: each contribution is
    ``1_000_000 div (k + rank)`` micro-units, so fusion output is
    engine-exact (the float sum's addition order never matters).

    ``rankings``: (query, item, rank, ranking) rows — ``ranking``
    names the source ranker.  One (query, item) aggregate + one
    per-query top-k window (compiles to WindowGroupLimit).  Shuffle
    is O(ranked rows), all keyed on the query.

    Returns (query, item, n_rankings, rrf_micro, rank).
    """
    from pyspark.sql import Window
    scored = (rankings.select(
        "query", "item",
        F.expr("1000000 div (%d + rank)" % int(k)).cast("long")
        .alias("c"))
        .groupBy("query", "item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rankings"),
             F.sum("c").cast("long").alias("rrf_micro")))
    w = Window.partitionBy("query").orderBy(
        F.col("rrf_micro").desc(), F.col("item"))
    return (scored.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .where(F.col("rank") <= int(top_k)))


def collapse_results(results: DataFrame, sites: DataFrame,
                     k: int = 1) -> DataFrame:
    """Search-result field collapsing (Lucene/ES ``collapse``, the
    one-result-per-domain rule every web SERP applies): within each
    query keep the top ``k`` results per site (score desc, item
    tiebreak), drop the rest, re-rank the survivors, and report how
    many results each surviving site had (the "more from this site"
    count).

    Candidate-bounded: this runs on the top-N result page, not the
    corpus — one site-keyed join against the (item, site) dim plus
    two windows (per (query, site), then per query).  Returns
    (query, item, site, rank, score, n_site_results)."""
    from pyspark.sql import Window
    joined = results.join(sites, "item")
    w_g = Window.partitionBy("query", "site").orderBy(
        F.col("score").desc(), F.col("item").asc())
    w_cnt = Window.partitionBy("query", "site")
    marked = joined.select(
        "query", "item", "site", "score",
        F.row_number().over(w_g).alias("__gr"),
        F.count(F.lit(1)).over(w_cnt).cast("long")
        .alias("n_site_results"))
    w_q = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("item").asc())
    return (marked.where(F.col("__gr") <= k)
            .select("query", "item", "site",
                    F.row_number().over(w_q).alias("rank"),
                    "score", "n_site_results"))
