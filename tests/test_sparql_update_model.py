"""Model-based property test of SPARQL UPDATE semantics: random
chains of INSERT DATA / DELETE DATA (default-graph and GRAPH-scoped) /
DELETE WHERE over a tiny vocabulary, mirrored against a pure-Python
quad-set model implementing the documented rules:

* inserts are set-semantics (already-present quads are no-ops);
* a default-graph DELETE DATA removes the triple from EVERY graph;
* a GRAPH-scoped DELETE DATA removes it from that graph only;
* DELETE WHERE { ?x <p> ?y } removes every matching row.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferenda_spark.session import get_spark
from ferenda_spark.sparql import sparql_update

SUBJ = ["http://x/s0", "http://x/s1", "http://x/s2"]
PRED = ["http://x/p0", "http://x/p1"]
OBJ = ["http://x/o0", "http://x/o1"]
CTX = [None, "http://x/g1", "http://x/g2"]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="update-model", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


_triple = st.tuples(st.sampled_from(SUBJ), st.sampled_from(PRED),
                    st.sampled_from(OBJ))

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), _triple, st.sampled_from(CTX)),
        st.tuples(st.just("delete"), _triple, st.sampled_from(CTX)),
        st.tuples(st.just("delete_where"), st.sampled_from(PRED),
                  st.none()),
    ),
    min_size=1, max_size=6)


def _data_block(t, ctx):
    stmt = "<%s> <%s> <%s> ." % t
    if ctx is not None:
        return "{ GRAPH <%s> { %s } }" % (ctx, stmt)
    return "{ %s }" % stmt


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_OPS, seed_rows=st.lists(
    st.tuples(_triple, st.sampled_from(CTX)), min_size=0, max_size=5))
def test_update_matches_quad_model(spark, ops, seed_rows):
    model = {(s, p, o, None, None, c)
             for (s, p, o), c in seed_rows}
    g = spark.createDataFrame(
        sorted(model, key=lambda r: tuple(x or "" for x in r)) or
        [("http://x/seed", "http://x/p0", "http://x/o0",
          None, None, None)],
        "subj string, pred string, obj string, obj_datatype string, "
        "obj_lang string, context string")
    if not model:
        model = {("http://x/seed", "http://x/p0", "http://x/o0",
                  None, None, None)}

    request = []
    for kind, a, b in ops:
        if kind == "insert":
            request.append("INSERT DATA " + _data_block(a, b))
            model = model | {(a[0], a[1], a[2], None, None, b)}
        elif kind == "delete":
            request.append("DELETE DATA " + _data_block(a, b))
            if b is None:
                model = {r for r in model if r[:3] != a}
            else:
                model = {r for r in model
                         if not (r[:3] == a and r[5] == b)}
        else:
            request.append(
                "DELETE WHERE { ?x <%s> ?y }" % a)
            model = {r for r in model if r[1] != a}

    out = sparql_update(g, " ;\n".join(request))
    got = {tuple(r) for r in out.collect()}
    assert got == model
