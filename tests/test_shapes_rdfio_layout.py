"""Edge cases for the session-8 operators: SHACL-lite validation,
N-Quads ingest (incl. the nt_lines round-trip), entity cards,
weighted sampling, link-spam features, winnowing (vs a brute-force
reference), SCC coloring (vs pure-Python Tarjan), bow-tie classes,
and Z-order keys (vs a bit-twiddling reference)."""

import random

import pytest

from pyspark.sql import functions as F

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-shapes-rdfio", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ------------------------------------------------------------- shacl

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _shapes(spark, rows):
    return spark.createDataFrame(
        rows, "shape_id string, target_class string, path string, "
              "min_count int, max_count int, pattern string")


def test_shacl_conforming_data_no_violations(spark):
    from ferenda_spark.operators.shapes import shacl_validate
    t = spark.createDataFrame(
        [("d1", RDF_TYPE, "Doc"), ("d1", "title", "A"),
         ("d1", "words", "12")],
        "subj string, pred string, obj string")
    shp = _shapes(spark, [("s1", "Doc", "title", 1, 1, None),
                          ("s2", "Doc", "words", 0, None, "^[0-9]+$")])
    assert shacl_validate(t, shp).count() == 0


def test_shacl_min_count_zero_missing_value_ok(spark):
    """minCount 0 + pattern: a focus with NO value for the path must
    not produce a pattern violation (the left join yields NULL obj,
    which is not a nonconforming value)."""
    from ferenda_spark.operators.shapes import shacl_validate
    t = spark.createDataFrame([("d1", RDF_TYPE, "Doc")],
                              "subj string, pred string, obj string")
    shp = _shapes(spark, [("s", "Doc", "words", 0, None, "^[0-9]+$")])
    assert shacl_validate(t, shp).count() == 0


def test_shacl_non_target_class_ignored(spark):
    from ferenda_spark.operators.shapes import shacl_validate
    t = spark.createDataFrame(
        [("d1", RDF_TYPE, "Other")],       # typed, but not the target
        "subj string, pred string, obj string")
    shp = _shapes(spark, [("s", "Doc", "title", 1, 1, None)])
    assert shacl_validate(t, shp).count() == 0


def test_shacl_untyped_node_never_validated(spark):
    from ferenda_spark.operators.shapes import shacl_validate
    t = spark.createDataFrame(
        [("d1", "title", "A")],            # no rdf:type at all
        "subj string, pred string, obj string")
    shp = _shapes(spark, [("s", "Doc", "title", 2, None, None)])
    assert shacl_validate(t, shp).count() == 0


def test_disjoint_axiom_order_insensitive(spark):
    from ferenda_spark.operators.shapes import disjoint_violations
    t = spark.createDataFrame(
        [("d", RDF_TYPE, "B"), ("d", RDF_TYPE, "A"),
         ("e", RDF_TYPE, "A")],
        "subj string, pred string, obj string")
    for pair in [("A", "B"), ("B", "A")]:
        ax = spark.createDataFrame([pair], "class_a string, class_b string")
        rows = disjoint_violations(t, ax).collect()
        assert [(r.subj, r.class_a, r.class_b) for r in rows] == \
            [("d", "A", "B")]


# ------------------------------------------------------------ rdfio

def test_nquads_roundtrip_nt_lines(spark):
    """parse_nquads ∘ nt_lines is the identity on the engine's triple
    conventions (IRIs, plain / lang / datatype literals, escapes)."""
    from ferenda_spark.catalog import nt_lines
    from ferenda_spark.operators.rdfio import parse_nquads
    rows = [
        ("http://s/1", "http://p", "http://o/x", None, None),
        ("http://s/2", "http://p", 'say "hi"\n\tnow \\ ok', None, None),
        ("http://s/3", "http://p", "bonjour", None, "fr"),
        ("http://s/4", "http://p", "42",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "obj_datatype string, obj_lang string")
    parsed = parse_nquads(nt_lines(t), col="line").collect()
    assert all(r.parse_ok for r in parsed)
    got = {(r.subj, r.pred, r.obj, r.obj_datatype, r.obj_lang)
           for r in parsed}
    assert got == set(rows)
    lits = {r.subj: r.is_literal for r in parsed}
    assert lits == {"http://s/1": False, "http://s/2": True,
                    "http://s/3": True, "http://s/4": True}


def test_nquads_quarantine_and_comments(spark):
    from ferenda_spark.operators.rdfio import parse_nquads
    lines = spark.createDataFrame(
        [("# a comment",), ("   ",),
         ("<http://s> <http://p> <http://o> extra .",),
         ('<http://s> <http://p> "unterminated .',),
         ("<http://s> <http://p> <http://o> .",)],
        "value string")
    out = parse_nquads(lines).collect()
    assert len(out) == 3                       # comment + blank dropped
    ok = [r for r in out if r.parse_ok]
    assert len(ok) == 1 and ok[0].subj == "http://s"
    bad = [r for r in out if not r.parse_ok]
    assert all(r.subj is None and r.raw for r in bad)


def test_nquads_graph_term(spark):
    from ferenda_spark.operators.rdfio import parse_nquads
    lines = spark.createDataFrame(
        [("<http://s> <http://p> <http://o> <http://g> .",),
         ("_:b0 <http://p> _:b1 _:g .",)], "value string")
    rows = {r.subj: r for r in parse_nquads(lines).collect()}
    assert rows["http://s"].graph == "http://g"
    assert rows["_:b0"].graph == "_:g"
    assert rows["_:b0"].obj == "_:b1"
    assert rows["_:b0"].is_literal is False


def test_turtle_numeric_and_bool_literals():
    """Turtle §2.5.2 abbreviated forms: bare 42 / 4.2 / 4e2 / true
    lex to xsd:integer/decimal/double/boolean, lexical preserved."""
    from ferenda_spark.turtle import parse_turtle
    xsd = "http://www.w3.org/2001/XMLSchema#"
    got = dict(
        ((p.rsplit("/", 1)[-1], o) for _, p, o in parse_turtle(
            "@prefix ex: <http://ex/> .\n"
            "ex:s ex:i 42 ; ex:d -4.25 ; ex:e 4e2 ; ex:b true .")))
    assert got["i"] == ("lit", "42", None, xsd + "integer")
    assert got["d"] == ("lit", "-4.25", None, xsd + "decimal")
    assert got["e"] == ("lit", "4e2", None, xsd + "double")
    assert got["b"] == ("lit", "true", None, xsd + "boolean")


def test_turtle_docs_explode_and_quarantine(spark):
    """parse_turtle_docs: one good doc -> its triples (prefix
    expansion, `a`, `;`/`,` lists); one bad doc -> exactly ONE
    quarantine row, never a failed task or a dropped doc."""
    from ferenda_spark.operators.rdfio import parse_turtle_docs
    good = ("@prefix ex: <http://ex/> .\n"
            'ex:s a ex:T ; ex:p "v"@en , ex:o .')
    docs = spark.createDataFrame(
        [(1, good), (2, "not turtle @@@")], "doc_id long, ttl string")
    rows = parse_turtle_docs(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3
    assert all(r.parse_ok for r in by_doc[1])
    assert {(r.obj, r.is_literal, r.obj_lang) for r in by_doc[1]} == {
        ("http://ex/T", False, None), ("v", True, "en"),
        ("http://ex/o", False, None)}
    (bad,) = by_doc[2]
    assert bad.parse_ok is False and bad.subj is None and bad.error


# ------------------------------------------------------ entity cards

def test_entity_cards_dedup_and_order(spark):
    from ferenda_spark.operators.triples import entity_cards
    t = spark.createDataFrame(
        [("s", "b", "2"), ("s", "a", "9"), ("s", "a", "1"),
         ("s", "b", "2")],                 # duplicate fact collapses
        "subj string, pred string, obj string")
    row = entity_cards(t).collect()[0]
    assert row.card == "a=1; a=9; b=2"
    assert row.n_triples == 3 and row.n_preds == 2


# -------------------------------------------------- weighted sample

def test_weighted_sample_bounds_and_nesting(spark):
    from ferenda_spark.operators.training import weighted_sample
    base = spark.range(500).select(F.col("id").alias("doc_id"))
    zero = base.withColumn("w", F.lit(0))
    full = base.withColumn("w", F.lit(10))
    assert weighted_sample(zero, "w", 10).count() == 0
    assert weighted_sample(full, "w", 10).count() == 500
    k3 = {r.doc_id for r in
          weighted_sample(base.withColumn("w", F.lit(3)), "w", 10)
          .collect()}
    k7 = {r.doc_id for r in
          weighted_sample(base.withColumn("w", F.lit(7)), "w", 10)
          .collect()}
    assert k3 <= k7                        # nested samples
    assert 0.15 < len(k3) / 500 < 0.45 and 0.55 < len(k7) / 500 < 0.85


# ------------------------------------------------------ spam features

def test_spam_features_sink_only_host(spark):
    from ferenda_spark.operators.cleaning import link_spam_features
    he = spark.createDataFrame([("a", "b"), ("c", "b")],
                               "src_host string, dst_host string")
    rows = {r.host: r for r in link_spam_features(he).collect()}
    assert rows["b"].out_hosts == 0 and rows["b"].in_hosts == 2
    assert rows["b"].reciprocity_ppm == 0
    assert rows["a"].out_hosts == 1 and rows["a"].recip_hosts == 0


def test_spam_features_full_reciprocity(spark):
    from ferenda_spark.operators.cleaning import link_spam_features
    he = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b")],   # duplicate edge deduped
        "src_host string, dst_host string")
    rows = {r.host: r for r in link_spam_features(he).collect()}
    assert rows["a"].reciprocity_ppm == 1000000
    assert rows["b"].reciprocity_ppm == 1000000


# --------------------------------------------------------- winnowing

def _winnow_reference(text, k, w):
    """Brute-force winnowing (robust/rightmost-min rule) mirroring the
    paper's definition; md5 like the operator."""
    import hashlib
    toks = text.lower().split()
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    out = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        m = min(win)
        pos = max(i for i, h in enumerate(win) if h == m) + s
        out.add((pos + 1, hs[pos][:8]))
    return out


def test_winnowing_matches_reference(spark):
    from ferenda_spark.operators.dedup import winnow_fingerprints
    rng = random.Random(7)
    docs = [(i, " ".join(rng.choice("abcde")
                         for _ in range(rng.randint(8, 30))))
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fingerprint))
    for i, text in docs:
        assert got.get(i, set()) == _winnow_reference(text, 3, 4), i


def test_winnowing_shared_run_guarantee(spark):
    """Any shared run of w+k-1 tokens yields >=1 shared fingerprint."""
    from ferenda_spark.operators.dedup import winnow_fingerprints
    shared = "p q r s t u"                     # w+k-1 = 6 tokens
    df = spark.createDataFrame(
        [(1, "a b c " + shared + " d e f"),
         (2, "x y " + shared + " z w v u t")],
        "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2]


def test_winnowing_short_doc_empty(spark):
    from ferenda_spark.operators.dedup import winnow_fingerprints
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # 1 gram < w windows -> no fingerprint rows, not an error
    assert winnow_fingerprints(df, k=3, w=4).count() == 0


# --------------------------------------------------------------- scc

def _tarjan(edges):
    """Pure-Python Tarjan; returns {node: scc_label} with the label
    being the max node id of the component (the operator's
    convention)."""
    from collections import defaultdict
    adj = defaultdict(list)
    nodes = set()
    for u, v in edges:
        adj[u].append(v)
        nodes.add(u)
        nodes.add(v)
    idx, low, on, stack = {}, {}, set(), []
    counter = [0]
    comp = {}

    def strong(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                idx[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in idx:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], idx[w])
            if recurse:
                continue
            if low[v] == idx[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = max(scc)
                for w in scc:
                    comp[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    for v in sorted(nodes):
        if v not in idx:
            strong(v)
    return comp


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_scc_matches_tarjan_random(spark, seed):
    from ferenda_spark.operators.graphs import scc_labels
    rng = random.Random(seed)
    n = 14
    edges = list({(rng.randrange(n), rng.randrange(n))
                  for _ in range(26)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.scc for r in scc_labels(df).collect()}
    assert got == _tarjan(edges)


def test_scc_self_loop_and_two_cycles(spark):
    from ferenda_spark.operators.graphs import scc_labels
    edges = [(1, 1), (2, 3), (3, 2), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.scc for r in scc_labels(df).collect()}
    assert got == {1: 1, 2: 3, 3: 3, 4: 4}


def test_bowtie_in_component(spark):
    """5 -> core(0<->1) -> 2; 9 disconnected."""
    from ferenda_spark.operators.graphs import bowtie_classes, scc_labels
    edges = [(0, 1), (1, 0), (5, 0), (1, 2), (9, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    scc = scc_labels(df)
    got = {r.node: r.cls for r in bowtie_classes(df, scc).collect()}
    assert got == {0: "CORE", 1: "CORE", 2: "OUT", 5: "IN", 9: "OTHER"}


# ------------------------------------------------------------ zorder

def _morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_reference_and_bijective(spark):
    from ferenda_spark.operators.store import zorder_keys
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)],
        "x long, y long")
    rows = zorder_keys(df, "x", "y", bits=4, bucket_bits=2).collect()
    zs = set()
    for r in rows:
        assert r.zvalue == _morton(r.x, r.y, 4)
        # top bucket_bits of the code = coarse quadrant of BOTH dims
        assert r.zbucket == ((r.y >> 3) << 1) | (r.x >> 3)
        zs.add(r.zvalue)
    assert len(zs) == 256                      # bijective on the grid


def test_zorder_masks_out_of_range(spark):
    from ferenda_spark.operators.store import zorder_keys
    df = spark.createDataFrame([(256, 1), (0, 1)], "x long, y long")
    rows = zorder_keys(df, "x", "y", bits=8, bucket_bits=4).collect()
    a, b = sorted(rows, key=lambda r: r.x)
    assert a.zvalue == b.zvalue                # 256 masks to 0
