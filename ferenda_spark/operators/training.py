"""Training-data assembly operators (driver mandate: the operations a
large-scale LLM training pipeline needs beyond cleaning/dedup):

* :func:`stratified_sample` — deterministic per-stratum subsampling by
  portable hash (no RNG: the sample is a pure function of the key, so
  re-runs, resumed runs and the DuckDB oracle all agree);
* :func:`pack_sequences` — GPT-style sequence packing: documents are
  concatenated in a deterministic order within hash shards and split
  into fixed token-budget packs; emits each document's pack
  coordinates (pack id / offset / spans);
* :func:`mixture_order` — deterministic weighted interleave of corpus
  sources (sampling-without-replacement mixture schedule): document i
  of source s sorts at position (i+1)/weight(s), giving each source a
  share proportional to its weight in any prefix of the schedule.

All three are pure DataFrame programs: the only shuffles are the
per-shard / per-stratum windows, each bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import tokens

# 32-bit hash universe (md5 prefix), shared with the DuckDB oracles
HASH_MOD = 10_000


def portable_bucket(key_col, mod: int = HASH_MOD):
    """Deterministic bucket in [0, mod): the first 8 md5 hex digits of
    the stringified key, as an integer.  Identical in Spark
    (conv(substr(md5(x),1,8),16,10)) and DuckDB
    (CAST('0x'||substr(md5(x),1,8) AS BIGINT)) — the cross-engine
    contract every sampling oracle relies on."""
    return (F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8),
                   16, 10).cast("long") % mod)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, key_col: str = "doc_id",
                      default: float = 0.0) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each
    stratum: row kept iff bucket(key) < fraction * HASH_MOD.

    Scale shape: a pure map-side filter — no shuffle, no RNG state,
    no sampling pass; the predicate pushes into the scan's partition
    batches.  Changing one stratum's fraction only adds/removes that
    stratum's rows (nested samples: a 10% sample is a subset of the
    20% sample), which is what incremental re-mixes need."""
    bucket = portable_bucket(F.col(key_col))
    thresh = F.lit(int(default * HASH_MOD))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(frac * HASH_MOD))).otherwise(thresh)
    return df.where(bucket < thresh)


def pack_sequences(documents: DataFrame, max_tokens: int = 512,
                   n_shards: int = 8, key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """GPT-style packing: within each shard, documents are concatenated
    in (key) order and the token stream is split into packs of
    ``max_tokens``; a document whose span crosses a boundary continues
    in the next pack (standard concat-then-chunk pretraining layout).

    Returns one row per document: (key, shard, n_tokens, start_off
    [token offset in the shard stream], pack_id, pack_off [offset
    inside its first pack], n_spans [how many packs it touches]).

    Scale shape: shard = portable hash of the key, so the single
    shuffle is the per-shard cumulative-sum window — at 10^12 docs
    ``n_shards`` is set ~10x the executor count and each window
    partition stays bounded; there is no global ordering anywhere.
    Tokens = the whitespace tokenizer shared with dedup/textstats
    (a real BPE count would slot into the same column)."""
    n_tok = F.size(tokens(F.col(text_col)))
    shard = portable_bucket(F.col(key_col)) % n_shards
    w = (Window.partitionBy("shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (documents
           .select(F.col(key_col),
                   shard.alias("shard"),
                   n_tok.cast("long").alias("n_tokens"))
           .withColumn("start_off",
                       F.coalesce(F.sum("n_tokens").over(w),
                                  F.lit(0)).cast("long")))
    # Integer arithmetic end-to-end (`div`, never double division +
    # cast): the oracle uses DuckDB's integer `//`, and a float must
    # never appear anywhere in the pack coordinates.
    m = int(max_tokens)
    return (out
            .withColumn("pack_id", F.expr(f"start_off div {m}"))
            .withColumn("pack_off", F.col("start_off") % m)
            .withColumn(
                "n_spans",
                F.expr(f"(start_off + greatest(n_tokens, 1L) - 1L)"
                       f" div {m}") - F.col("pack_id") + F.lit(1)))


def mixture_order(df: DataFrame, source_col: str, weights: dict,
                  key_col: str = "doc_id",
                  default_weight: float = 1.0) -> DataFrame:
    """Deterministic mixture schedule: the i-th document (1-based, in
    (hash-bucket, key) order — a deterministic within-source shuffle)
    of source s gets order_key = i / weight(s); consuming
    rows by ascending order_key yields sources in proportion to their
    weights in every prefix (the standard without-replacement
    interleave used for corpus mixing).

    Returns (key, source, source_rank, order_key) — order_key is the
    schedule position; consumers sort/range-partition by it rather
    than materializing a global row number (a global row_number would
    serialize on one partition; a range sort by order_key scales).

    The per-source rank window partitions by source — at 10^12 rows a
    handful of giant sources would skew it, so rank is computed as
    within-(source, bucket) rank + broadcast bucket offsets: the
    window partitions by (source, 256 hash buckets), each bounded, and
    the offsets table (sources x 256 rows) is driver-sized."""
    n_buckets = 256
    bucket = portable_bucket(F.col(key_col)) % n_buckets
    base = df.select(F.col(key_col), F.col(source_col).alias("source"),
                     bucket.alias("__b"))
    # bounded: |sources| * n_buckets rows
    counts = (base.groupBy("source", "__b")
              .agg(F.count(F.lit(1)).alias("c")))
    woff = (Window.partitionBy("source").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("c").over(woff), F.lit(0)))
    wrank = Window.partitionBy("source", "__b").orderBy(key_col)
    wexpr = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        wexpr = F.when(F.col("source") == value,
                       F.lit(float(wt))).otherwise(wexpr)
    return (base
            .withColumn("__r", F.row_number().over(wrank))
            .join(F.broadcast(offsets.select("source", "__b", "__off")),
                  ["source", "__b"])
            .withColumn("source_rank",
                        (F.col("__off") + F.col("__r")).cast("long"))
            .withColumn("order_key",
                        F.round(F.col("source_rank") / wexpr, 6))
            .select(key_col, "source", "source_rank", "order_key"))


def domain_cap(df: DataFrame, key_col: str, order_cols: list,
               k: int, id_col: str = "doc_id",
               n_buckets: int = 32) -> DataFrame:
    """Per-key top-``k`` cap (RefinedWeb/C4-style per-domain quota:
    keep at most k documents per host, preferring the given order —
    e.g. quality descending).  Adds ``rank`` (1..k within the key) and
    drops everything beyond the cap.

    Scale shape — the naive single window partitioned by domain puts
    an entire hot domain in one task (exactly the skew the north rule
    calls out), so the cap runs in two phases: phase 1 ranks within
    (key, hash-bucket-of-id) — every partition bounded by the bucket
    fan-out — and locally discards beyond k, so at most k*n_buckets
    rows per key survive to phase 2's true per-key window.  For a hot
    domain with 10^9 docs and k=5, phase 2 sees 160 rows instead of
    10^9.  ``order_cols`` must be a deterministic total order (break
    ties on the id) or the cap is nondeterministic by definition."""
    bucket = (portable_bucket(F.col(id_col)) % n_buckets).alias("__b")
    w1 = Window.partitionBy(key_col, "__b").orderBy(*order_cols)
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    return (df.withColumn("__b", bucket)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .drop("__b", "__r1"))


def chunk_documents(documents: DataFrame, window: int = 16,
                    stride: int = 12, key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding-window token chunking (RAG / pretraining context
    assembly): each document becomes overlapping windows of
    ``window`` tokens advanced by ``stride``; the tail window is
    partial, and every chunk carries its token coordinates so
    downstream packing/retrieval can map back into the document.

    Returns (key, chunk_id, start_tok, n_tokens, chunk_text) — one
    row per window, chunk_id = start_tok / stride.

    Scale shape: tokenize + sequence() + posexplode is a pure
    map-side row generator — no shuffle, no UDF; output partitioning
    inherits the input, and each output row is bounded by the window
    size, so a 10^12-document corpus chunks in one embarrassingly
    parallel pass.  Tokenization uses the engine-pinned whitespace
    class shared with dedup/packing (`dedup.TOKEN_SPLIT`)."""
    toks = tokens(F.col(text_col))
    # keep docs with at least one non-whitespace char (SQL trim()
    # strips only spaces, so a tab-only doc would survive a
    # length(trim()) test in BOTH engines — test the pinned class)
    base = (documents
            .where(F.col(text_col).rlike("[^ \t\n\r\f\x0B]"))
            .select(F.col(key_col), toks.alias("__toks"))
            .withColumn("__n", F.size("__toks")))
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    return (base
            .select(key_col, "__toks", "__n",
                    F.explode(starts).alias("start_tok"))
            .select(F.col(key_col),
                    (F.col("start_tok") / stride)
                    .cast("int").alias("chunk_id"),
                    F.col("start_tok").cast("int"),
                    F.least(F.lit(window),
                            F.col("__n") - F.col("start_tok"))
                    .cast("int").alias("n_tokens"),
                    F.array_join(
                        F.slice("__toks", F.col("start_tok") + 1,
                                window), " ").alias("chunk_text")))


def train_corpus(documents: DataFrame, key_col: str = "doc_id",
                 text_col: str = "text", window: int = 16,
                 stride: int = 12) -> DataFrame:
    """End-to-end training-corpus assembly — the one-call path a
    training-data team runs per ingest: exact dedup (keep the minimum
    doc id per text-prefix hash) -> MinHash-LSH near-duplicate
    clustering (keep one representative per connected component) ->
    Gopher-style quality gate -> PII redaction -> sliding-window
    chunking.  Each stage is the individually-oracle-verified
    operator; this composes them in the order a production pipeline
    applies them (dedup before quality so duplicate families are
    scored once; redaction after filtering so regex work is spent
    only on surviving docs; chunking last).

    Returns chunk rows: (key, chunk_id, start_tok, n_tokens,
    chunk_text) over the redacted text of surviving documents.

    Scale shape: the composition adds no new shuffle beyond its
    stages' own — exact dedup is one hash groupBy + a semi join on
    the key, near-dup keeps the banded LSH self-join + the hash-min
    component fixpoint on candidate pairs only, the quality gate and
    redaction are map-side, chunking is a map-side row generator.
    Stage boundaries are where a cluster run would commit snapshot
    stage tables (see operators.incremental.run_stage_atomic)."""
    from .cleaning import redact_pii
    from .dedup import dup_clusters, exact_duplicates, minhash_band_pairs
    from .textstats import quality_score

    docs = documents.select(F.col(key_col).alias("doc_id"),
                            F.col(text_col).alias("text"))
    keep_exact = (exact_duplicates(docs)
                  .select(F.col("canonical_doc_id").alias("doc_id")))
    docs = docs.join(keep_exact, "doc_id", "semi")
    # near-dup representatives: docs in no candidate pair keep
    # themselves; clustered docs survive iff they are the component min
    drop_near = (dup_clusters(minhash_band_pairs(docs))
                 .where(F.col("doc_id") != F.col("canonical_doc_id"))
                 .select("doc_id"))
    docs = docs.join(drop_near, "doc_id", "anti")
    keep_q = quality_score(docs).where("keep").select("doc_id")
    docs = docs.join(keep_q, "doc_id", "semi")
    red = (redact_pii(docs)
           .select("doc_id", F.col("text_redacted").alias("text")))
    return chunk_documents(red, window=window, stride=stride,
                           key_col="doc_id", text_col="text")


def dsir_weights(documents: DataFrame, target_lang: str = "en",
                 n_buckets: int = 1024) -> DataFrame:
    """DSIR-style importance-resampling weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    model the target and raw distributions over HASHED unigram
    features, and weight each raw document by its average
    log-likelihood ratio under the two bag-of-words models.  Here the
    target distribution is the ``lang == target_lang`` slice of the
    corpus itself (DSIR's target is any trusted subset; the slice
    keeps the oracle closed-form), add-one smoothed over `n_buckets`
    hashed-feature buckets.

    weight(doc) = mean over tokens of
        ln (ct[b]+1)/(Nt+B) - ln (cn[b]+1)/(Nn+B)
    where b = portable md5 bucket of the token, ct/cn = target /
    non-target bucket counts, Nt/Nn their totals, B = n_buckets (the
    contrast is target vs complement — contrasting against the full
    raw corpus, which CONTAINS the target, biases every smoothed
    ratio below 1).  ``target_like`` marks the top half of the corpus
    by weight, decided with the rank-based integer split of
    :func:`ferenda_spark.operators.textstats.ccnet_buckets` (whole
    tie group together, no float percentile).

    Scale shape: feature extraction is map-side (hash of each token,
    no vocabulary table); the two count tables are one groupBy each
    over at most `n_buckets` keys (map-side partials collapse them);
    totals are a 1-row broadcast aggregate; the scoring join keys on
    the bucket id against a `n_buckets`-row broadcast table; the
    final per-doc mean is one groupBy on doc_id.  The median split
    windows over the groupBy(weight) AGGREGATE, whose size is capped
    by the 6-digit rounding (every weight is a mean of per-bucket
    logs, so the value range is a few units wide — at most a few
    hundred thousand distinct rounded values no matter how many
    documents), then joins back keyed on the weight.  No shuffle
    ever carries text; the model table is O(n_buckets), not O(vocab).

    Returns (doc_id, n_tokens, dsir_logw, target_like); docs whose
    text splits to zero tokens cannot occur (split('') = ['']), so
    every document scores.
    """
    toks = tokens(F.col("text"))
    feats = (documents.select("doc_id", "lang",
                              F.explode(toks).alias("w"))
             .select("doc_id", "lang",
                     portable_bucket(F.col("w"), n_buckets).alias("b")))
    is_t = (F.col("lang") == target_lang).cast("long")
    counts = feats.groupBy("b").agg(
        F.sum(is_t).alias("ct"),
        F.sum(1 - is_t).alias("cn"))
    totals = feats.agg(F.sum(is_t).alias("nt"),
                       F.sum(1 - is_t).alias("nn"))
    llr = (counts.crossJoin(F.broadcast(totals))
           .select("b",
                   (F.log(F.col("ct") + 1) - F.log(F.col("nt") + n_buckets)
                    - F.log(F.col("cn") + 1)
                    + F.log(F.col("nn") + n_buckets)).alias("llr")))
    scored = (feats.join(F.broadcast(llr), "b")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_tokens"),
                   F.round(F.avg("llr"), 6).alias("dsir_logw")))
    per_w = scored.groupBy("dsir_logw").agg(F.count("*").alias("c"))
    win = (Window.orderBy(F.col("dsir_logw").desc())
           .rowsBetween(Window.unboundedPreceding, -1))
    cuts = (per_w
            .withColumn("c_before",
                        F.coalesce(F.sum("c").over(win), F.lit(0)))
            .withColumn("n_all", F.sum("c").over(
                Window.partitionBy(F.lit(1))))
            .select("dsir_logw",
                    F.expr("c_before * 2 div n_all = 0")
                    .alias("target_like")))
    return (scored.join(F.broadcast(cuts), "dsir_logw")
            .select("doc_id", "n_tokens", "dsir_logw", "target_like"))


def _merge_pair(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol
    occurrences in a symbol array — one fold, map-side.  The string
    replace trick is WRONG here (' a b a b ' shares separator spaces,
    so literal replace misses every second merge); the fold carries
    the previous unmerged symbol explicitly."""
    merged = left + right
    init = F.struct(F.array().cast("array<string>").alias("acc"),
                    F.lit("").alias("prev"))
    def step(a, s):
        hit = (a.prev == left) & (s == right)
        return (F.when(hit, F.struct(
                    F.concat(a.acc, F.array(F.lit(merged))).alias("acc"),
                    F.lit("").alias("prev")))
                .otherwise(F.struct(
                    F.when(a.prev == "", a.acc)
                     .otherwise(F.concat(a.acc, F.array(a.prev)))
                     .alias("acc"),
                    s.alias("prev"))))
    def fin(a):
        return (F.when(a.prev == "", a.acc)
                .otherwise(F.concat(a.acc, F.array(a.prev))))
    return F.aggregate(syms, init, step, fin)


def bpe_train(documents: DataFrame, n_merges: int = 20) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): the
    word-frequency dictionary is built once (one groupBy over the
    token stream — Zipf-bounded: millions of types at web scale, not
    10^12), then each round counts adjacent symbol pairs weighted by
    word frequency (one groupBy on the pair), picks the most frequent
    pair (count desc, then lexicographic left/right — a deterministic
    total order), and merges it map-side in every word via a fold.
    No end-of-word marker (documented deviation; add one by appending
    it to the char split).

    Scale shape: every round = one pair-keyed groupBy with map-side
    partials over the WORD DICTIONARY (not the corpus) + a 1-row
    driver argmax (sanctioned dimension-sized collect) + a map-side
    merge; the dictionary frame is localCheckpointed per round (the
    merge expression would otherwise nest k folds deep).  Rounds stop
    early when no adjacent pair remains.

    Returns the merge table (merge_rank, left, right, merged,
    pair_count) — the artifact a tokenizer ships."""
    words = (documents
             .select(F.explode(tokens(F.col("text"))).alias("word"))
             .where(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("freq"))
             .select(F.split("word", "").alias("syms"), "freq")
             .localCheckpoint())
    out = []
    for rank in range(1, n_merges + 1):
        pairs = (words
                 .select(F.explode(F.arrays_zip(
                     F.slice("syms", 1, F.size("syms") - 1),
                     F.slice("syms", 2, F.size("syms") - 1)))
                     .alias("p"), "freq")
                 .select(F.col("p.0").alias("l"),
                         F.col("p.1").alias("r"), "freq")
                 .groupBy("l", "r").agg(F.sum("freq").alias("n"))
                 .orderBy(F.col("n").desc(), "l", "r").limit(1)
                 .collect())
        if not pairs:
            break
        best = pairs[0]
        out.append((rank, best["l"], best["r"],
                    best["l"] + best["r"], int(best["n"])))
        words = (words.select(
            _merge_pair(F.col("syms"), best["l"], best["r"])
            .alias("syms"), "freq")
            .localCheckpoint())
    spark = documents.sparkSession
    return spark.createDataFrame(
        out, "merge_rank int, left string, right string, "
             "merged string, pair_count long")


def bpe_encode_counts(documents: DataFrame, merges: DataFrame,
                      checkpoint_every: int = 4) -> DataFrame:
    """Apply a trained BPE merge table (:func:`bpe_train`) and report
    per-document piece counts — the number that drives packing
    budgets and per-source token accounting.

    Scale shape: merges apply to the distinct WORD DICTIONARY (type
    encoding — Zipf-bounded), never to the raw token stream; each
    merge is the map-side fold of :func:`_merge_pair` applied in rank
    order, with a localCheckpoint every ``checkpoint_every`` merges
    (the folds would otherwise nest k deep in one expression); doc
    counts come from joining the token stream against the
    (word -> n_pieces) dictionary and one groupBy.  The merge table
    itself is a driver-sized artifact (the tokenizer file).

    Returns (doc_id, n_ws_tokens, n_bpe_tokens)."""
    mg = [(r["left"], r["right"])
          for r in merges.orderBy("merge_rank").collect()]
    tok = (documents
           .select("doc_id", F.explode(tokens(F.col("text")))
                   .alias("word"))
           .where(F.col("word") != ""))
    words = (tok.select("word").distinct()
             .select("word", F.split("word", "").alias("syms"))
             .localCheckpoint())
    for i, (l, r) in enumerate(mg, 1):
        words = words.select(
            "word", _merge_pair(F.col("syms"), l, r).alias("syms"))
        if i % checkpoint_every == 0 or i == len(mg):
            words = words.localCheckpoint()
    wlen = words.select("word", F.size("syms").alias("n_pieces"))
    return (tok.join(wlen, "word")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_ws_tokens"),
                 F.sum("n_pieces").alias("n_bpe_tokens")))


def source_temperature(df: DataFrame, source_col: str = "source",
                       ) -> DataFrame:
    """Temperature-scaled source sampling rates (the multilingual /
    multi-source mixture rule of mBERT/XLM-R, alpha = 0.5): with
    p_s the source's share of documents, sample source s with
    q_s = sqrt(p_s) / sum_t sqrt(p_t); ``boost`` = q_s/p_s is the
    up/down-sampling factor (small sources up, hot sources down).
    alpha is pinned to 0.5 because sqrt is IEEE-correctly-rounded in
    every engine, so the oracle is bit-portable where a pow(p, 0.3)
    would not be.

    Scale shape: one groupBy over the source column; everything after
    runs on the dimension-sized source table with a 1-row broadcast
    total.  Returns (source, n_docs, p, q, boost), shares rounded
    to 6."""
    cnt = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").alias("n_all"),
                  F.sum(F.sqrt(F.col("n_docs"))).alias("sq_sum"))
    # sqrt(p_s) = sqrt(n_s)/sqrt(N): use sqrt(n)/sum(sqrt(n)) so no
    # intermediate division feeds the pow
    return (cnt.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.round(F.col("n_docs") / F.col("n_all"), 6)
                    .alias("p"),
                    F.round(F.sqrt(F.col("n_docs")) / F.col("sq_sum"),
                            6).alias("q"),
                    F.round((F.sqrt(F.col("n_docs")) / F.col("sq_sum"))
                            / (F.col("n_docs") / F.col("n_all")), 6)
                    .alias("boost")))


NEG_LCG_A = 1103515245
NEG_LCG_C = 12345
NEG_LCG_M = 2147483648  # 2**31


def kg_negative_samples(positives: DataFrame, n_entities: int,
                        k: int = 2,
                        example_col: str = "example_id",
                        tail_col: str = "pos_entity") -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (TransE-style tail corruption, Bordes et al. 2013): for each
    positive (example, tail) emit up to ``k`` corrupted tails drawn
    by a *portable LCG* — glibc constants over a 2^31 modulus, pure
    int64 arithmetic, so the "random" draw is a bit-identical
    function of the example id in Spark, the SQL oracle, and any
    resumed run (the same no-RNG discipline as stratified_sample).

    False negatives are removed by an anti-join of the generated
    (example, candidate) pairs against the true positives — the
    *filtered* sampling regime; removed draws are not re-drawn
    (standard practice: the loss just sees <=k negatives there).

    Shape: candidate generation is map-side (explode of a k-literal
    array); the only shuffle is the anti-join against the positives,
    keyed on the pair itself.  Returns (example_id, pos_entity,
    neg_entity, sample_idx)."""
    seeded = (positives
              .select(F.col(example_col).cast("long").alias("example_id"),
                      F.col(tail_col).cast("long").alias("pos_entity"),
                      F.explode(F.sequence(F.lit(1), F.lit(k)))
                      .alias("idx"))
              .withColumn("sample_idx", F.col("idx").cast("long"))
              .drop("idx"))
    cand = seeded.withColumn(
        "neg_entity",
        ((F.lit(NEG_LCG_A) * (F.col("example_id") * (k + 1)
                              + F.col("sample_idx"))
          + F.lit(NEG_LCG_C)) % NEG_LCG_M) % n_entities)
    truth = positives.select(
        F.col(example_col).cast("long").alias("example_id"),
        F.col(tail_col).cast("long").alias("neg_entity"))
    return (cand
            .join(truth, ["example_id", "neg_entity"], "anti")
            .select("example_id", "pos_entity", "neg_entity",
                    "sample_idx"))


def token_budget_allocation(avail: DataFrame, weights: DataFrame,
                            budget: int) -> DataFrame:
    """Allocate a training-token budget across sources by weight with
    availability caps — the mixture-budgeting step of corpus assembly
    (a source can't contribute more tokens than it has; its unused
    share is redistributed to the uncapped sources).

    Two proportional passes (the closed-form prefix of the waterfall:
    exact when at most one redistribution round caps out, the common
    case; the residue after pass 2 stays unallocated and is reported
    via the ``alloc_tokens`` sum):

    1. ``a1 = min(avail, weight * budget div W)``
    2. ``a2 = a1 + min(avail - a1, weight * leftover div W_uncapped)``

    All integer div — deterministic across engines.  ``avail``:
    (source, avail_tokens); ``weights``: (source, weight).  Sources
    and totals are dimension-sized: every join is a broadcast of a
    1-row aggregate or the source dim; nothing corpus-scale moves.
    Returns (source, avail_tokens, weight, alloc_tokens)."""
    base = (avail.join(F.broadcast(weights), "source")
            .select("source",
                    F.col("avail_tokens").cast("long").alias("avail_tokens"),
                    F.col("weight").cast("long").alias("weight")))
    tot_w = base.agg(F.sum("weight").cast("long").alias("w_all"))
    p1 = (base.crossJoin(F.broadcast(tot_w))
          .withColumn("a1", F.least(
              F.col("avail_tokens"),
              F.expr("weight * %d div w_all" % budget))))
    tot1 = p1.agg(
        (F.lit(budget) - F.sum("a1")).cast("long").alias("leftover"),
        F.sum(F.when(F.col("a1") < F.col("avail_tokens"),
                     F.col("weight")).otherwise(0))
        .cast("long").alias("w_unc"))
    return (p1.crossJoin(F.broadcast(tot1))
            .withColumn("a2", F.when(
                (F.col("w_unc") > 0) & (F.col("a1") < F.col("avail_tokens")),
                F.least(F.col("avail_tokens") - F.col("a1"),
                        F.expr("weight * leftover div w_unc")))
                .otherwise(0))
            .select("source", "avail_tokens", "weight",
                    (F.col("a1") + F.col("a2")).alias("alloc_tokens")))


def deterministic_walks(edges: DataFrame, walk_len: int = 3,
                        walks_per_node: int = 2,
                        src: str = "doc_a",
                        dst: str = "doc_b") -> DataFrame:
    """DeepWalk-style walk-corpus generation with a *deterministic*
    pseudo-random next hop: at step k of walk w from node v, the
    neighbor minimizing md5(v '-' neighbor '-' k '-' w) wins — the
    same portable-hash discipline every sampling op in this repo uses
    (md5 is bit-identical across engines), so the walk corpus is a
    pure function of the graph and the driver oracle can replay it.
    Real node2vec randomness is this with the hash seeded per epoch.

    Shape per step: one frontier⋈edges equi-join + a per-(walk,step)
    min-hash groupBy + a join back to recover the argmin neighbor —
    all keyed on walk ids, no windows over the graph, frontier
    localCheckpointed per step.  Walks that reach a sink stop early.
    Returns (start, walk_idx, step, node) — step 0 is the start
    node itself."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    starts = e.select("u").distinct()
    frontier = (starts
                .join(F.broadcast(
                    starts.sparkSession.range(walks_per_node)
                    .select(F.col("id").alias("walk_idx"))),
                    how="cross")
                .select(F.col("u").alias("start"), "walk_idx",
                        F.lit(0).alias("step"),
                        F.col("u").alias("node"))
                .localCheckpoint(eager=True))
    out = frontier
    for k in range(1, walk_len + 1):
        cand = (frontier.join(e, frontier["node"] == e["u"])
                .select("start", "walk_idx",
                        F.col("v").alias("nxt"),
                        F.md5(F.concat_ws(
                            "-", F.col("node").cast("string"),
                            F.col("v").cast("string"),
                            F.lit(str(k)),
                            F.col("walk_idx").cast("string")))
                        .alias("h")))
        best = (cand.groupBy("start", "walk_idx")
                .agg(F.min("h").alias("h")))
        frontier = (cand.join(best, ["start", "walk_idx", "h"])
                    .select("start", "walk_idx",
                            F.lit(k).alias("step"),
                            F.col("nxt").alias("node"))
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    return out


def contrastive_pairs(documents: DataFrame, n: int = 3,
                      num_hashes: int = 8, band_size: int = 2,
                      threshold: float = 0.75) -> DataFrame:
    """Contrastive training-pair mining for embedding models from the
    LSH index itself: every banded candidate pair is scored with the
    signature-only Jaccard estimate; pairs at/above ``threshold``
    become POSITIVES, pairs below become HARD NEGATIVES — LSH false
    positives are exactly the near-miss pairs contrastive losses
    need (textually entangled yet not duplicates; random negatives
    are trivially separable and teach nothing, cf. SimCSE/DPR hard-
    negative mining).

    Scale shape: inherits :func:`dedup.minhash_estimated_jaccard`'s
    plan — banded self-join + two signature-keyed joins, text never
    shuffles; labeling is one map-side CASE.  The threshold compares
    against the integer-ppm estimate (repo convention — no float
    columns).  Returns (doc_a, doc_b, n_agree, est_jaccard_ppm,
    label)."""
    from .dedup import minhash_estimated_jaccard
    est = minhash_estimated_jaccard(documents, n, num_hashes,
                                    band_size)
    threshold_ppm = int(round(threshold * 1000000))
    return est.select(
        "doc_a", "doc_b", "n_agree", "est_jaccard_ppm",
        F.when(F.col("est_jaccard_ppm") >= threshold_ppm,
               F.lit("positive"))
        .otherwise(F.lit("hard_negative")).alias("label"))


def weighted_sample(df: DataFrame, weight_col: str, max_weight: int,
                    key_col: str = "doc_id") -> DataFrame:
    """Weight-proportional Bernoulli sample, integer-exact.

    Row kept iff ``u32 * max_weight < weight * 2^32`` where ``u32`` is
    the 32-bit md5 prefix of the key — i.e. keep-probability
    ``weight / max_weight``, with the comparison in 64-bit integer
    arithmetic so Spark and the SQL oracle agree bit-for-bit (no
    float ever appears; u32 < 2^32 and corpus weights are small, so
    the product fits a long with room to spare).

    This is the quality-weighted corpus downsampling step of modern
    pretraining mixes (keep high-quality pages with probability
    proportional to a score — the soft variant of hard C4/Gopher
    cuts).  Like :func:`stratified_sample` it is a pure map-side
    filter: no shuffle, no RNG state, nested across reweightings
    (raising one row's weight can only add it, never evict others).

    ``weight_col`` must be integral and in [0, max_weight]; rows at
    max_weight are always kept, weight 0 never.
    """
    u32 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                             1, 8), 16, 10).cast("long")
    return df.where(u32 * F.lit(int(max_weight))
                    < F.col(weight_col).cast("long") * F.lit(1 << 32))


def length_buckets(documents: DataFrame, text_col: str = "text",
                   bucket_tokens: int = 64,
                   max_bucket: int = 15) -> DataFrame:
    """Length-bucketing audit for batch-efficient training: documents
    are binned by token count (linear buckets of ``bucket_tokens``,
    capped at ``max_bucket``) and each bucket reports the padding
    waste of batching its members to the bucket maximum --
    ``padding_frac = 1 - sum_tokens / (n_docs * max_tokens)``.
    High-waste buckets tell the packer where variable-length batching
    (or finer buckets) pays.

    All-integer bucket arithmetic (``n div bucket_tokens``, capped),
    LONG sums, and ONE division per bucket -- engine-exact.  One
    map-side-partial groupBy on a 16-row dimension.

    Returns (bucket, n_docs, sum_tokens, max_tokens, padding_frac);
    empty documents (0 tokens) land in bucket 0 with NULL
    padding_frac when the bucket max is 0.
    """
    from .dedup import tokens
    n = (F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
         .otherwise(F.size(tokens(F.col(text_col))))).cast("long")
    b = F.least(F.expr("n div %d" % int(bucket_tokens)),
                F.lit(int(max_bucket)).cast("long"))
    agg = (documents.select(n.alias("n"))
           .select(b.alias("bucket"), "n")
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n").cast("long").alias("sum_tokens"),
                F.max("n").cast("long").alias("max_tokens")))
    denom = F.col("n_docs") * F.col("max_tokens")
    return agg.select(
        "bucket", "n_docs", "sum_tokens", "max_tokens",
        F.when(denom > 0,
               F.lit(1.0) - F.col("sum_tokens").cast("double") / denom)
        .alias("padding_frac"))


def split_leakage(documents: DataFrame, n: int = 3,
                  num_hashes: int = 8, band_size: int = 2,
                  train_max: int = 8000,
                  val_max: int = 9000) -> DataFrame:
    """Train/eval contamination check: an eval (val/test) document
    whose near-duplicate cluster also contains a train document is
    LEAKED — its eval loss measures memorization, not generalization
    (the held-out-split analogue of benchmark contamination; cf. the
    dedup-before-split practice in GPT-3/Gopher data work).

    Composes the MinHash-LSH candidate pairs, the hash-min
    connected-component clusters, and the portable-md5 split
    assignment (all three already driver-verified individually), so
    the check is a pure function of the corpus: stable under re-runs
    and corpus growth.  Default split here is 80/10/10 (not the
    96/2/2 of train_split_assignment): a contamination audit wants
    eval mass large enough that cluster-straddling is detectable.

    Scale shape: cluster membership is cluster-edge-sized (docs that
    appear in at least one candidate pair — a tiny fraction of the
    corpus); the split label is a map-side md5 of doc_id (no join
    against a split table); the per-cluster train count is one
    groupBy over membership rows.  Nothing touches the full corpus
    beyond the already-bucketed LSH stage.

    Returns (doc_id, split, canonical_doc_id, n_train_dups) for every
    leaked eval document: ``n_train_dups`` = number of TRAIN docs in
    its duplicate cluster.
    """
    from .dedup import dup_clusters, minhash_band_pairs
    pairs = minhash_band_pairs(documents, n=n, num_hashes=num_hashes,
                               band_size=band_size)
    members = dup_clusters(pairs)
    b = portable_bucket(F.col("doc_id"))
    split = documents.select(
        "doc_id",
        F.when(b < train_max, "train")
        .when(b < val_max, "val")
        .otherwise("test").alias("split"))
    m = members.join(split, "doc_id")
    per_cluster = (m.groupBy("canonical_doc_id")
                   .agg(F.sum(F.when(F.col("split") == "train", 1)
                              .otherwise(0)).cast("long")
                        .alias("n_train_dups")))
    return (m.where(F.col("split") != "train")
            .join(per_cluster, "canonical_doc_id")
            .where(F.col("n_train_dups") > 0)
            .select("doc_id", "split", "canonical_doc_id",
                    "n_train_dups"))


def neyman_allocation(rows: DataFrame, sample_n: int,
                      stratum_col: str = "source",
                      value_col: str = "n_chars") -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a total
    sample budget, allocate to each stratum proportionally to
    ``N_h * sigma_h`` (population size x within-stratum standard
    deviation) — the allocation that minimizes the variance of the
    stratified estimator (Neyman 1934).  Equal-proportion sampling
    (train_stratified_sample) oversamples homogeneous strata; this
    is what a measurement-grade eval split actually wants.

    Exactness discipline: per-stratum sum and sum-of-squares are
    EXACT integer aggregates; variance arrives as the single integer
    ``var_micro = (n*sumsq - sum^2) * 1_000_000 div n^2`` and sigma
    as ``floor(sqrt(var_micro))`` — sqrt IS correctly rounded
    (IEEE 754, unlike ln/pow), so every engine computes the same
    long.  Weights, their total, and the final allocation
    (``sample_n * w_h div total_w``) stay in integer arithmetic
    end-to-end; the +remainder correction goes to the highest-weight
    strata (weight desc, stratum asc — deterministic) so the
    allocation sums exactly to ``sample_n``.

    One groupBy on the stratum key; the stratum table is
    dimension-sized, so the final window is metadata-cheap.

    Returns (stratum, n_rows, sigma_floor, weight, alloc_n,
    alloc_permille).
    """
    from pyspark.sql import Window
    g = (rows.groupBy(F.col(stratum_col).alias("stratum"))
         .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
              F.sum(F.col(value_col).cast("long")).alias("_s"),
              F.sum(F.col(value_col).cast("long")
                    * F.col(value_col).cast("long")).alias("_ss")))
    g = g.withColumn(
        "_var_micro",
        F.expr("(n_rows * _ss - _s * _s) * 1000000 div "
               "(n_rows * n_rows)"))
    g = g.withColumn(
        "sigma_floor",
        F.floor(F.sqrt(F.col("_var_micro").cast("double")))
        .cast("long"))
    g = g.withColumn("weight", F.col("n_rows") * F.col("sigma_floor"))
    tot = Window.partitionBy()
    wrank = Window.orderBy(F.col("weight").desc(), F.col("stratum"))
    base = F.expr("%d * weight div _tw" % int(sample_n))
    return (g.withColumn("_tw", F.sum("weight").over(tot))
            .withColumn("_base", base.cast("long"))
            .withColumn("_rem",
                        (F.lit(int(sample_n))
                         - F.sum("_base").over(tot)).cast("long"))
            .withColumn("_rn", F.row_number().over(wrank).cast("long"))
            .select("stratum", "n_rows", "sigma_floor", "weight",
                    (F.col("_base")
                     + F.when(F.col("_rn") <= F.col("_rem"), 1)
                     .otherwise(0)).cast("long").alias("alloc_n"),
                    F.expr("1000 * weight div _tw").cast("long")
                    .alias("alloc_permille")))


def curriculum_schedule(docs: DataFrame, difficulty_col: str,
                        total_epochs: int = 10,
                        id_col: str = "doc_id") -> DataFrame:
    """Competence-based curriculum (Platanios et al., NAACL 2019):
    rank documents by difficulty, and admit each one at the first
    epoch whose competence covers its percentile — with the root
    competence schedule c(t) = sqrt(t/T), doc enters when
    c(t) >= rank/n, i.e. first_epoch = ceil(T * rank^2 / n^2),
    computed as (T*rank^2 + n^2 - 1) div n^2 and clamped to >= 1 —
    exact integer arithmetic end to end.

    The global rank uses the mann_whitney two-pass trick, NOT a
    single-partition window: one groupBy to per-difficulty-value
    counts, a dimension-sized running sum over the ordered distinct
    values, then row_number only WITHIN each value (groups bounded
    by that value's frequency) with the id tiebreak.  rank^2 stays
    in long for corpora below ~3e9 docs; beyond that the percentile
    moves to fixed-point before squaring (noted, not needed here).

    Returns (doc_id, difficulty, rank, first_epoch)."""
    from pyspark.sql import Window
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(difficulty_col).cast("long")
                    .alias("difficulty"))
    per_v = (d.groupBy("difficulty")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    wv = (Window.orderBy("difficulty")
          .rowsBetween(Window.unboundedPreceding, -1))
    cum = per_v.select(
        "difficulty",
        F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("cum_before"))
    wi = Window.partitionBy("difficulty").orderBy("doc_id")
    ranked = (d.join(cum, "difficulty")
              .select("doc_id", "difficulty",
                      (F.col("cum_before")
                       + F.row_number().over(wi)).alias("rank")))
    n_row = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    fe = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(%d * rank * rank + n * n - 1) div (n * n)"
               % total_epochs).cast("long"))
    return (ranked.crossJoin(F.broadcast(n_row))
            .select("doc_id", "difficulty", "rank",
                    fe.alias("first_epoch")))


def pareto_selection(items: DataFrame, group_col: str = "source",
                     cost_col: str = "cost",
                     value_col: str = "value",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-group 2-D Pareto frontier (the skyline operator): keep
    items no other item dominates (<= cost AND >= value, strict in
    one) — multi-criteria training-data selection (e.g. minimize
    length-cost, maximize freshness) without collapsing the two
    axes into one arbitrary weighted score.

    Scalable shape instead of the quadratic dominance join: (1) one
    (group, cost) aggregate keeps each cost's best value, (2) the
    frontier test is a running strict-max window over the per-cost
    AGGREGATE (distinct costs — dimension-bounded, never the item
    stream), (3) survivors map back by one (group, cost) join where
    value == the cost's best (equal (cost, value) duplicates are
    mutually non-dominating and all survive).  The oracle states
    dominance INDEPENDENTLY as a NOT EXISTS quadratic join, so a
    frontier bug cannot hide in a shared formulation.

    Returns (group, id, cost, value) frontier rows."""
    from pyspark.sql import Window
    it = items.select(F.col(group_col).alias("group"),
                      F.col(id_col).alias("id"),
                      F.col(cost_col).cast("long").alias("cost"),
                      F.col(value_col).cast("long").alias("value"))
    per_cost = (it.groupBy("group", "cost")
                .agg(F.max("value").alias("vmax")))
    w = (Window.partitionBy("group").orderBy(F.col("cost").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier_costs = (per_cost
                      .withColumn("prev_best", F.max("vmax").over(w))
                      .where(F.col("prev_best").isNull()
                             | (F.col("vmax") > F.col("prev_best")))
                      .select("group", "cost", "vmax"))
    return (it.join(frontier_costs, ["group", "cost"])
            .where(F.col("value") == F.col("vmax"))
            .select("group", "id", "cost", "value"))
