"""Minimal SPARQL -> DataFrame compiler over the triples table (Q12).

The reference issues SPARQL against its triplestore for ad-hoc
inspection and for the annotation/dependency queries
(/root/reference/ferenda/triplestore.py:138-173 ``select``,
/root/reference/ferenda/devel.py:618-682 ad-hoc queries,
res/sparql/*.rq).  This module compiles the slice of SPARQL those
call sites actually use — basic graph patterns, OPTIONAL, FILTER,
DISTINCT, ORDER BY, LIMIT — into a DataFrame plan over the
``(subj, pred, obj, ...)`` triples table:

* each BGP triple pattern becomes a filtered scan of the triples
  DataFrame with constant terms pushed into the scan (predicate
  pushdown reaches parquet);
* shared variables between patterns become equi-join conditions;
  join order is as written, then Catalyst + AQE reorder/broadcast —
  selective patterns (constant pred + constant obj) produce small
  build sides that AQE turns into broadcast joins;
* ``OPTIONAL { ... }`` compiles to a left join of the sub-group plan;
* ``FILTER (...)`` compiles to a Column expression (comparisons,
  ``&& || !``, ``regex``, ``bound``, ``contains``, ``strstarts``).

Grammar (case-insensitive keywords)::

    query    := prefix* ('SELECT' 'DISTINCT'? ('*' | selitem+)
                         ('FROM' <iri>)?
                         | 'CONSTRUCT' ('{' triple* '}')?   (absent
                           template = CONSTRUCT WHERE shorthand)
                         | 'ASK' | 'DESCRIBE' (term+))
                'WHERE' group ('GROUP' 'BY' ?var+)?
                ('HAVING' '(' expr ')')?
                ('ORDER' 'BY' order+)? ('LIMIT' int)?
    update   := prefix* uop (';' uop)*
    uop      := 'INSERT DATA' quads | 'DELETE DATA' quads
                | 'DELETE WHERE' group
                | ('DELETE' '{' triple* '}')?
                  ('INSERT' '{' triple* '}')? 'WHERE' group
    quads    := '{' (triple | 'GRAPH' <iri> '{' triple* '}')* '}'
    selitem  := ?var | '(' agg 'AS' ?alias ')' | agg
    agg      := ('COUNT'|'SUM'|'MIN'|'MAX'|'AVG'|'SAMPLE')
                '(' 'DISTINCT'? ('*' | ?var) ')'
    prefix   := 'PREFIX' name ':' '<iri>'
    group    := '{' (triples '.' | 'OPTIONAL' group
                     | '{' 'SELECT' ... '}'     (subquery)
                     | 'GRAPH' (<iri> | ?var) group
                     | group ('UNION' group)*
                     | 'MINUS' group
                     | 'BIND' '(' operand 'AS' ?var ')'
                     | 'VALUES' (?var | '(' ?var+ ')') '{' data '}'
                       (data cells may be UNDEF — full solution
                        compatibility, deferred to group end)
                     | 'FILTER' ('(' expr ')'
                                 | 'NOT'? 'EXISTS' group))* '}'
    triples  := term path term (';' path term)* (',' term)*
                (term: ?var | <iri> | pfx:name | "literal" | number
                 | 'a'; `;`/`,` are the abbreviated-list forms)
    path     := pseq ('|' pseq)*          (alternative -> UNION)
    pseq     := patom ('/' patom)*        (sequence -> hidden joins)
    patom    := '^'? term ('*'|'+'|'?')?  (inverse / zero-or-more /
                                           one-or-more / zero-or-one)
                | '!' (term | '(' ('^'? term) ('|' '^'? term)* ')')
                  ('*'|'+'|'?')?          (negated property sets)
    order    := ?var | 'ASC(' ?var ')' | 'DESC(' ?var ')'
    expr     := comparisons (= != < <= > >=), && || !, IN / NOT IN,
                regex (w/ flags) / contains / strstarts / strends /
                sameTerm / bound, isURI/isIRI/isLiteral/isBlank(?v),
                lang(?v), langMatches(lang(?v), "tag"); HAVING exprs
                may additionally contain aggregate calls
    operand  := arithmetic (+ - * /, xsd:double promotion) over
                terms, str(?v), lang(?v), IF(cond, a, b), and the
                §17.4 scalar builtins: STRLEN UCASE LCASE SUBSTR
                CONCAT STRBEFORE STRAFTER REPLACE COALESCE ABS CEIL
                FLOOR ROUND DATATYPE IRI/URI ENCODE_FOR_URI
                MD5/SHA1/SHA256/SHA384/SHA512, and the literal
                constructors STRLANG/STRDT (value = lexical form;
                the tag/datatype lands in the hidden term-metadata
                columns when BINDing) — all compiled to pure Column
                expressions (JVM-side, no Python)
    agg      := COUNT SUM MIN MAX AVG SAMPLE GROUP_CONCAT(?v ;
                SEPARATOR="s") — GROUP_CONCAT sorts its values for a
                deterministic (engine-portable) result, SPARQL leaves
                the order unspecified

FROM <g> and GRAPH <g> compile to pushed-down equality on the
``context`` column (named-graph scoping).  Verified against the
reference's own integration-test queries and expected results
(tests/test_sparql_reference_goldens.py), including the shipped
annotation query res/sparql/annotations.rq (``dcterms:isPartOf*`` —
tests/test_sparql.py golden).

Property paths compile to distributed fixpoints: a constant endpoint
becomes a broadcast-frontier BFS over the ``pred``-filtered edge scan
(O(diameter) rounds, each one shuffle join, lineage cut per round);
var-var paths build the transitive-closure pair set semi-naively —
correct for the bounded-diameter part/annotation hierarchies the
reference queries (annotations.rq), quadratic in the worst case and
documented as such.  Aggregates compile to ``groupBy().agg()`` —
map-side partial aggregation, one shuffle (COUNT per
triplestore.py:653-666, GROUP BY per triplestore.py:138-173
passthrough semantics).

The SELECT/CONSTRUCT/ASK surfaces now cover every construct the
reference's own shipped .rq files use (res/sparql/annotations.rq,
sources/tech/res/sparql/rfc-annotations.rq — BIND / isUri / str() /
IN, sources/legal/se/res/sparql/sfs_changes.rq — STRSTARTS(STR(..))
/ IN over predicate lists), plus ASK and DESCRIBE (CBD semantics —
the skolemized model has no blank nodes, so the bounded description
is the resource's outgoing triples), DISTINCT inside aggregates
(COUNT/SUM/AVG; a no-op for MIN/MAX), and negated property sets
(``!iri`` / ``!(a|^b)`` incl. inverse members, ``^!(...)``, and path
modifiers over the NPS edge set — desugared to variable-predicate
scans with NOT-IN filters per SPARQL 1.1 §9.1), and subqueries (``{ SELECT ... }`` evaluated
independently, projected variables natural-joined with the outer
bindings; a subquery without FROM inherits the enclosing constant
graph), and UPDATE (:func:`sparql_update` — INSERT/DELETE DATA,
DELETE WHERE, DELETE/INSERT ... WHERE with `;` chaining, the
triplestore update passthrough; :func:`sparql_update_table` commits
the result atomically to a snapshot table with time-travel history).
VALUES UNDEF follows SPARQL solution
compatibility (an UNDEF cell joins any binding — generalized join
with coalesced output).  FILTER [NOT] EXISTS and MINUS compile to
semi/anti joins on the shared variables (equi semantics; a disjoint
MINUS removes nothing per SPARQL 1.1 §8.3.3).  DESCRIBE follows SPARQL 1.1
§16.4: constant IRIs are always described; listed variables
contribute their distinct bindings over the WHERE solutions, and the
two forms mix.  Property paths and subqueries inside GRAPH ?var run
per named graph (path fixpoints keyed by graph id; subquery
projection/DISTINCT/aggregation carry the graph id as an implicit
key, LIMIT applies per graph).  Unsupported (documented, raises
SparqlError): variable predicates under a path modifier (not legal
SPARQL path syntax either), subqueries with their own FROM inside
GRAPH ?var.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


class SparqlError(ValueError):
    pass


DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "dcterms": "http://purl.org/dc/terms/",
    "bibo": "http://purl.org/ontology/bibo/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
    "prov": "http://www.w3.org/ns/prov#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.-]*)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[{}().,;=<>!*+^/|?-])
""", re.X)


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlError("cannot tokenize at: %r" % text[pos:pos + 20])
        pos = m.end()
        if m.lastgroup != "ws":
            out.append(m.group())
    return out


class _Var:
    def __init__(self, name):
        self.name = name


class _Const:
    def __init__(self, value, kind="uri"):
        self.value = value
        # "uri" | "lit" | "num" — CONSTRUCT term fidelity, and the
        # FILTER numeric-comparison trigger: only terms parsed from
        # BARE number tokens are "num"; a quoted "007" stays "lit" and
        # compares by codepoint per SPARQL plain-literal semantics
        self.kind = kind


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes = dict(DEFAULT_PREFIXES)
        self._fresh = 0

    def _fresh_var(self) -> _Var:
        """Hidden intermediate variable for desugared path sequences
        (dropped from SELECT * output by the __ prefix convention)."""
        self._fresh += 1
        return _Var("__p%d" % self._fresh)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, kw):
        t = self.next()
        if t.lower() != kw.lower():
            raise SparqlError("expected %r, got %r" % (kw, t))
        return t

    # ---------------------------------------------------------- terms

    def term(self):
        t = self.next()
        if t.startswith("?"):
            return _Var(t[1:])
        if t.startswith("<") and t.endswith(">"):
            return _Const(t[1:-1])
        if t.startswith('"'):
            body = t[1:-1]
            return _Const(re.sub(r'\\(.)', r'\1', body), kind="lit")
        if t == "a":
            return _Const(DEFAULT_PREFIXES["rdf"] + "type")
        if ":" in t:
            pfx, local = t.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlError("unknown prefix %r" % pfx)
            return _Const(self.prefixes[pfx] + local)
        if re.fullmatch(r"-?\d+(\.\d+)?", t):
            return _Const(t, kind="num")
        raise SparqlError("bad term %r" % t)

    # ---------------------------------------------------------- query

    def parse_construct(self):
        self._prefixes_decl()
        self.expect("construct")
        if self.peek() and self.peek().lower() == "where":
            # SPARQL 1.1 §10.2.2 shorthand: CONSTRUCT WHERE { bgp } —
            # the pattern is its own template (plain triples only)
            self.next()
            group = self.group()
            template = [pl for k, pl in group if k == "triple"]
            if not template or any(k != "triple" for k, _ in group):
                raise SparqlError(
                    "CONSTRUCT WHERE takes a plain BGP")
            if self.peek() is not None:
                raise SparqlError("trailing tokens at %r"
                                  % self.peek())
            return {"template": template, "group": group}
        template = []
        self.expect("{")
        while self.peek() != "}":
            s, p, o = self.term(), self.term(), self.term()
            template.append((s, p, o))
            if self.peek() == ".":
                self.next()
        self.next()
        self.expect("where")
        group = self.group()
        if self.peek() is not None:
            raise SparqlError("trailing tokens at %r" % self.peek())
        return {"template": template, "group": group}

    def _prefixes_decl(self):
        while self.peek() and self.peek().lower() == "prefix":
            self.next()
            pname = self.next()
            if not pname.endswith(":"):
                if ":" in pname:
                    pname = pname.split(":")[0] + ":"
                else:
                    self.expect(":")
                    pname = pname + ":"
            iri = self.next()
            self.prefixes[pname[:-1]] = iri[1:-1]

    _AGG_FNS = ("count", "sum", "min", "max", "avg", "sample",
                "group_concat")

    def _agg(self):
        """AGG '(' DISTINCT? ('*' | ?var) (';' 'SEPARATOR' '=' str)?
        ')' -> ("agg", fn, distinct, argvar-or-None).  GROUP_CONCAT
        carries its separator by becoming fn=("group_concat", sep)."""
        fn = self.next().lower()
        self.expect("(")
        distinct = False
        if self.peek() and self.peek().lower() == "distinct":
            self.next()
            distinct = True
        if self.peek() == "*":
            self.next()
            arg = None
            if distinct:
                raise SparqlError("COUNT(DISTINCT *) is not supported")
        else:
            # ?var, or any scalar expression (SUM(?a * 2 + 1),
            # AVG(STRLEN(?t)) — SPARQL 1.1 aggregates take
            # expressions); a plain variable stays a column name,
            # anything else compiles at aggregation time
            op = self._operand()
            arg = op.name if isinstance(op, _Var) else op
        if fn == "group_concat":
            sep = " "                       # SPARQL 1.1 §18.5.1.7 default
            if self.peek() == ";":
                self.next()
                if (self.peek() or "").lower() != "separator":
                    raise SparqlError("expected SEPARATOR after ';' in "
                                      "GROUP_CONCAT")
                self.next()
                self.expect("=")
                sept = self.term()
                if not (isinstance(sept, _Const) and sept.kind == "lit"):
                    raise SparqlError("SEPARATOR takes a string literal")
                sep = sept.value
            fn = ("group_concat", sep)
        self.expect(")")
        if fn != "count" and arg is None:
            raise SparqlError("%s(*) is not supported"
                              % (fn if isinstance(fn, str)
                                 else fn[0]).upper())
        return ("agg", fn, distinct, arg)

    def parse(self):
        self._prefixes_decl()
        return self._select_query(sub=False)

    def _select_query(self, sub=False):
        """SELECT query body (after any prefix declarations).  With
        ``sub=True`` this is a subquery: parsing stops at the
        enclosing ``}`` instead of requiring end-of-input."""
        self.expect("select")
        distinct = False
        if self.peek() and self.peek().lower() == "distinct":
            self.next()
            distinct = True
        # sel: None for '*', else list of ("var", name) |
        # ("agg", fn, distinct, argvar, alias)
        sel = []
        if self.peek() == "*":
            self.next()
            sel = None
        else:
            while True:
                t = self.peek()
                if t is None:
                    break
                if t.startswith("?"):
                    sel.append(("var", self.next()[1:]))
                elif t == "(":
                    self.next()
                    item = self._agg()
                    self.expect("as")
                    alias = self.next()
                    if not alias.startswith("?"):
                        raise SparqlError("AS takes ?alias, got %r" % alias)
                    self.expect(")")
                    sel.append(item + (alias[1:],))
                elif (t.lower() in self._AGG_FNS
                      and self.i + 1 < len(self.toks)
                      and self.toks[self.i + 1] == "("):
                    # the reference's bare-aggregate form
                    # (triplestore.py:656 `SELECT COUNT(*) WHERE ...`);
                    # the output column is named after the function
                    item = self._agg()
                    fn_name = (item[1] if isinstance(item[1], str)
                               else item[1][0])
                    sel.append(item + (fn_name,))
                else:
                    break
            if not sel:
                raise SparqlError("empty SELECT list")
        from_ctx = None
        if self.peek() and self.peek().lower() == "from":
            self.next()
            from_ctx = self.term()
            if isinstance(from_ctx, _Var):
                raise SparqlError("FROM takes an IRI")
        self.expect("where")
        group = self.group()
        groupby = []
        if self.peek() and self.peek().lower() == "group":
            self.next()
            self.expect("by")
            while self.peek() and self.peek().startswith("?"):
                groupby.append(self.next()[1:])
            if not groupby:
                raise SparqlError("empty GROUP BY list")
        having = None
        if self.peek() and self.peek().lower() == "having":
            # HAVING (expr) — expr may contain aggregate calls
            # (compiled as hidden aggregate columns) and output aliases
            self.next()
            self.expect("(")
            having = self.expr()
            self.expect(")")
        order, limit = [], None
        if self.peek() and self.peek().lower() == "order":
            self.next()
            self.expect("by")
            while True:
                t = self.peek()
                if t is None or t == "}" or t.lower() in ("limit",):
                    break
                t = self.next()
                if t.lower() in ("asc", "desc"):
                    self.expect("(")
                    v = self.next()[1:]
                    self.expect(")")
                    order.append((v, t.lower() == "asc"))
                elif t.startswith("?"):
                    order.append((t[1:], True))
                else:
                    raise SparqlError("bad ORDER BY term %r" % t)
        if self.peek() and self.peek().lower() == "limit":
            self.next()
            limit = int(self.next())
        if not sub and self.peek() is not None:
            raise SparqlError("trailing tokens at %r" % self.peek())
        return {"select": sel, "distinct": distinct, "group": group,
                "from": from_ctx, "groupby": groupby, "order": order,
                "limit": limit, "having": having}

    def group(self):
        self.expect("{")
        if self.peek() and self.peek().lower() == "select":
            # GroupGraphPattern ::= '{' SubSelect '}' — a group whose
            # whole body is a subquery (e.g. GRAPH ?g { SELECT ... })
            ast = self._select_query(sub=True)
            self.expect("}")
            return [("subquery", ast)]
        items = []
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("unterminated group")
            if t == "}":
                self.next()
                return items
            if t.lower() == "optional":
                self.next()
                items.append(("optional", self.group()))
            elif (t == "{" and self.i + 1 < len(self.toks)
                    and self.toks[self.i + 1].lower() == "select"):
                # subquery { SELECT ... }: evaluated independently,
                # projected variables join the outer bindings
                self.next()
                ast = self._select_query(sub=True)
                self.expect("}")
                items.append(("subquery", ast))
            elif t == "{":
                # nested group — possibly a UNION chain:
                # { A } UNION { B } UNION { C }
                branches = [self.group()]
                while self.peek() and self.peek().lower() == "union":
                    self.next()
                    branches.append(self.group())
                if len(branches) == 1:
                    items.extend(branches[0])
                else:
                    items.append(("union", branches))
            elif t.lower() == "graph":
                self.next()
                ctx = self.term()
                items.append(("graph", (ctx, self.group())))
            elif t.lower() == "bind":
                # BIND(expr AS ?var) — the reference's own shipped
                # query uses the variable-alias form
                # (sources/tech/res/sparql/rfc-annotations.rq:24
                # ``BIND(?s as ?referencer)``); expr here is any
                # operand the FILTER grammar knows (term, str(),
                # lang(), concat())
                self.next()
                self.expect("(")
                operand = self._operand()
                self.expect("as")
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlError("BIND ... AS takes ?var, got %r" % v)
                self.expect(")")
                items.append(("bind", (operand, v[1:])))
            elif t.lower() == "values":
                # VALUES ?v { t... } | VALUES (?v1 ?v2) { (t1 t2)... }
                self.next()
                if self.peek() == "(":
                    self.next()
                    names = []
                    while self.peek() != ")":
                        v = self.next()
                        if not v.startswith("?"):
                            raise SparqlError("VALUES takes ?vars")
                        names.append(v[1:])
                    self.next()
                    self.expect("{")
                    rows = []
                    while self.peek() == "(":
                        self.next()
                        row = []
                        while self.peek() != ")":
                            row.append(self._values_term())
                        self.next()
                        if len(row) != len(names):
                            raise SparqlError("VALUES row arity mismatch")
                        rows.append(row)
                    self.expect("}")
                else:
                    v = self.next()
                    if not v.startswith("?"):
                        raise SparqlError("VALUES takes ?var")
                    names = [v[1:]]
                    self.expect("{")
                    rows = []
                    while self.peek() != "}":
                        rows.append([self._values_term()])
                    self.next()
                items.append(("values", (names, rows)))
            elif t.lower() == "filter":
                self.next()
                nxt = self.peek().lower() if self.peek() else ""
                if nxt in ("exists", "not"):
                    # FILTER [NOT] EXISTS { group } — no parens form
                    neg = nxt == "not"
                    self.next()
                    if neg:
                        self.expect("exists")
                    items.append(("exists", (neg, self.group())))
                else:
                    self.expect("(")
                    items.append(("filter", self.expr()))
                    self.expect(")")
            elif t.lower() == "minus":
                self.next()
                items.append(("minus", self.group()))
            else:
                s = self.term()
                while True:                      # `;` predicate lists
                    path = self._parse_path()
                    while True:                  # `,` object lists
                        o = self.term()
                        self._emit_path(s, path, o, items)
                        if self.peek() == ",":
                            self.next()
                            continue
                        break
                    if self.peek() == ";":
                        self.next()
                        if self.peek() in (".", "}"):  # trailing ;
                            break
                        continue
                    break
                if self.peek() == ".":
                    self.next()

    # ------------------------------------------------ property paths
    # path := seq ('|' seq)* ; seq := atom ('/' atom)* ;
    # atom := '^'? iri ('*' | '+' | '?')?
    # Desugared at parse time into the core pattern algebra: inverse
    # swaps endpoints, sequences chain through hidden fresh variables,
    # alternatives become UNION branches — so the compiler's join/
    # union machinery (and its plans) handle every combination.

    def _parse_path(self):
        seqs = [self._parse_path_seq()]
        while self.peek() == "|":
            self.next()
            seqs.append(self._parse_path_seq())
        return ("alt", seqs) if len(seqs) > 1 else seqs[0]

    def _parse_path_seq(self):
        atoms = [self._parse_path_atom()]
        while self.peek() == "/":
            self.next()
            atoms.append(self._parse_path_atom())
        return ("seq", atoms) if len(atoms) > 1 else atoms[0]

    def _parse_path_atom(self):
        inv = False
        if self.peek() == "^":
            self.next()
            inv = True
        if self.peek() == "!":
            # negated property set !iri / !(iri|^iri|...): desugared
            # at emit time into variable-predicate scans + NOT IN
            # filters (forward and inverse member sets separately, per
            # SPARQL 1.1 §9.1); a trailing modifier routes through the
            # path fixpoint machinery over the NPS edge set
            self.next()
            fwd, bwd = [], []
            if self.peek() == "(":
                self.next()
                while True:
                    if self.peek() == "^":
                        self.next()
                        bwd.append(self.term())
                    else:
                        fwd.append(self.term())
                    if self.peek() == "|":
                        self.next()
                        continue
                    break
                self.expect(")")
            else:
                fwd.append(self.term())
            if any(not isinstance(t, _Const) or t.kind != "uri"
                   for t in fwd + bwd):
                raise SparqlError("negated property set needs "
                                  "constant IRIs")
            if inv:
                # ^!(F|^B) over (s,o) == !(B|^F) over (s,o) with the
                # member sets swapped
                fwd, bwd = bwd, fwd
            mod = None
            if self.peek() in ("*", "+", "?"):
                mod = self.next()
            return ("nps", fwd, bwd, mod)
        t = self.term()
        mod = None
        if self.peek() in ("*", "+", "?"):
            mod = self.next()
        if (inv or mod) and (not isinstance(t, _Const)
                             or t.kind != "uri"):
            raise SparqlError("property path needs constant IRI "
                              "predicates")
        return ("patom", t, inv, mod)

    def _emit_path(self, s, path, o, items):
        kind = path[0]
        if kind == "nps":
            _, fwd, bwd, mod = path
            if mod:
                items.append(("path", (s, ("nps", fwd, bwd), mod, o)))
                return
            branches = []
            if fwd:
                pv = self._fresh_var()
                branches.append([("triple", (s, pv, o)),
                                 ("filter", ("in", pv, fwd, True))])
            if bwd:
                pv = self._fresh_var()
                branches.append([("triple", (o, pv, s)),
                                 ("filter", ("in", pv, bwd, True))])
            if len(branches) == 1:
                items.extend(branches[0])
            else:
                items.append(("union", branches))
        elif kind == "patom":
            _, t, inv, mod = path
            subj, obj = (o, s) if inv else (s, o)
            if mod:
                items.append(("path", (subj, t, mod, obj)))
            else:
                items.append(("triple", (subj, t, obj)))
        elif kind == "seq":
            atoms = path[1]
            cur = s
            for i, atom in enumerate(atoms):
                nxt = o if i == len(atoms) - 1 else self._fresh_var()
                self._emit_path(cur, atom, nxt, items)
                cur = nxt
        else:                                    # alt
            branches = []
            for sub in path[1]:
                b: list = []
                self._emit_path(s, sub, o, b)
                branches.append(b)
            items.append(("union", branches))

    # ------------------------------------------------------- FILTER expr

    def expr(self):
        node = self.and_expr()
        while self.peek() == "||":
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.unary()
        while self.peek() == "&&":
            self.next()
            node = ("and", node, self.unary())
        return node

    def unary(self):
        if self.peek() == "!":
            self.next()
            return ("not", self.unary())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t == "(":
            self.next()
            node = self.expr()
            self.expect(")")
            # '(?a + 1) > 2': a parenthesized SCALAR followed by a
            # comparison — unwrap the truthy node back to its operand
            op = self.peek()
            if (node[0] == "truthy"
                    and op in ("=", "!=", "<", "<=", ">", ">=")):
                self.next()
                return ("cmp", op, node[1], self._operand())
            return node
        if t and t.lower() == "regex":
            self.next()
            self.expect("(")
            a = self._operand()
            self.expect(",")
            b = self.term()
            if not isinstance(b, _Const):
                raise SparqlError("REGEX takes a constant pattern")
            if self.peek() == ",":       # optional flags arg
                self.next()
                flags = self.term()
                if not isinstance(flags, _Const):
                    raise SparqlError("REGEX takes constant flags")
                if flags.value:
                    b = _Const("(?%s)%s" % (flags.value, b.value),
                               kind="lit")
            self.expect(")")
            return ("regex", a, b)
        if t and t.lower() in ("contains", "strstarts", "strends"):
            fn = self.next().lower()
            self.expect("(")
            a = self._operand()
            self.expect(",")
            b = self._operand()
            self.expect(")")
            return (fn, a, b)
        if t and t.lower() == "sameterm":
            self.next()
            self.expect("(")
            a = self._operand()
            self.expect(",")
            b = self._operand()
            self.expect(")")
            return ("sameterm", a, b)
        if t and t.lower() == "bound":
            self.next()
            self.expect("(")
            v = self.term()
            self.expect(")")
            return ("bound", v)
        if t and t.lower() in ("isuri", "isiri", "isliteral", "isblank"):
            # term-kind tests (rfc-annotations.rq:16 ``!isUri(?o)``);
            # compiled against the hidden obj_kind binding
            fn = self.next().lower()
            self.expect("(")
            v = self.term()
            self.expect(")")
            if not isinstance(v, _Var):
                raise SparqlError("%s() takes a variable" % fn)
            return ("iskind", "uri" if fn in ("isuri", "isiri")
                    else "lit" if fn == "isliteral" else "blank", v)
        if t and t.lower() == "langmatches":
            self.next()
            self.expect("(")
            lang = self._lang_call()
            self.expect(",")
            tag = self.term()
            self.expect(")")
            return ("langmatches", lang, tag)
        left = self._operand()
        op = self.peek()
        if op in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self._operand()
            return ("cmp", op, left, right)
        if op and op.lower() in ("in", "not"):
            # ?x IN (a, b, c) — membership over a constant list
            # (sfs_changes.rq:14, rfc-annotations.rq:31)
            neg = op.lower() == "not"
            self.next()
            if neg:
                self.expect("in")
            self.expect("(")
            terms = []
            while True:
                terms.append(self.term())
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return ("in", left, terms, neg)
        return ("truthy", left)

    # SPARQL 1.1 §17.4 scalar builtins: name -> (min_args, max_args)
    _SCALAR_FNS = {
        "strlen": (1, 1), "ucase": (1, 1), "lcase": (1, 1),
        "substr": (2, 3), "concat": (1, 99), "strbefore": (2, 2),
        "strafter": (2, 2), "replace": (3, 3), "coalesce": (1, 99),
        "abs": (1, 1), "ceil": (1, 1), "floor": (1, 1),
        "round": (1, 1), "datatype": (1, 1), "iri": (1, 1),
        "uri": (1, 1), "md5": (1, 1), "sha1": (1, 1),
        "sha256": (1, 1), "sha384": (1, 1), "sha512": (1, 1),
        "encode_for_uri": (1, 1), "strlang": (2, 2), "strdt": (2, 2),
    }

    def _operand(self):
        """A scalar expression: additive chains over multiplicative
        chains of unary operands (SPARQL 1.1 §17 operator precedence;
        operands cast to xsd:double under arithmetic)."""
        node = self._mul_operand()
        while True:
            t = self.peek()
            if t in ("+", "-"):
                self.next()
                node = ("arith", t, node, self._mul_operand())
            elif t and re.fullmatch(r"-\d+(\.\d+)?", t):
                # '-3' right after an operand lexed as a negative
                # number is a subtraction: rewrite the token to its
                # positive half IN PLACE and re-parse at the
                # multiplicative level, so precedence still holds
                # ('STRLEN(?t)-1*2' is len - (1*2), not (len-1)*2)
                self.toks[self.i] = t[1:]
                node = ("arith", "-", node, self._mul_operand())
            else:
                return node

    def _mul_operand(self):
        node = self._unary_operand()
        while self.peek() in ("*", "/"):
            node = ("arith", self.next(), node, self._unary_operand())
        return node

    def _unary_operand(self):
        """A primary scalar operand: plain term, '(' expr ')',
        str(?v)/lang(?v), IF(cond, a, b), a scalar builtin call, or
        an aggregate call (HAVING operand position)."""
        t = self.peek()
        if t == "(":
            self.next()
            node = self._operand()
            self.expect(")")
            return node
        if t and t.lower() == "lang":
            return self._lang_call()
        if t and t.lower() in self._AGG_FNS \
                and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == "(":
            # aggregate call as a HAVING operand
            return ("aggop",) + self._agg()[1:]
        if t and t.lower() == "str" and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == "(":
            self.next()
            self.expect("(")
            inner = self._operand()
            self.expect(")")
            return ("str", inner)
        if t and t.lower() == "if" and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == "(":
            self.next()
            self.expect("(")
            cond = self.expr()
            self.expect(",")
            a = self._operand()
            self.expect(",")
            b = self._operand()
            self.expect(")")
            return ("if", cond, a, b)
        if t and t.lower() in self._SCALAR_FNS \
                and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == "(":
            name = self.next().lower()
            self.expect("(")
            args = [self._operand()]
            while self.peek() == ",":
                self.next()
                args.append(self._operand())
            self.expect(")")
            lo, hi = self._SCALAR_FNS[name]
            if not lo <= len(args) <= hi:
                raise SparqlError("%s() takes %d..%d args, got %d"
                                  % (name.upper(), lo, hi, len(args)))
            return ("fn", name, args)
        return self.term()

    def _values_term(self):
        t = self.peek()
        if t and t.lower() == "undef":
            self.next()
            return None
        return self.term()

    def _lang_call(self):
        self.expect("lang")
        self.expect("(")
        v = self.term()
        self.expect(")")
        if not isinstance(v, _Var):
            raise SparqlError("lang() takes a variable")
        return ("lang", v)


# ---------------------------------------------------------------- compile

def _term_col(term):
    if isinstance(term, _Var):
        return F.col(term.name)
    return F.lit(term.value)


def _lang_col(var):
    """lang(?v): the hidden obj_lang binding; '' when absent (the
    SPARQL lang() of a plain literal)."""
    return F.coalesce(F.col("__lang_" + var.name), F.lit(""))


def _operand_col(op, cols=()):
    if isinstance(op, tuple) and op[0] == "lang":
        return _lang_col(op[1])
    if isinstance(op, tuple) and op[0] == "str":
        # STR(?v): the lexical form — identity over the string-encoded
        # term columns (URIs store the IRI string, literals the lexical
        # form), per SPARQL 1.1 §17.4.2.5
        return _operand_col(op[1], cols)
    if isinstance(op, tuple) and op[0] == "arith":
        # SPARQL numeric operators: operands promoted to xsd:double
        _, o, a, b = op
        ca = _operand_col(a, cols).cast("double")
        cb = _operand_col(b, cols).cast("double")
        return {"+": ca + cb, "-": ca - cb,
                "*": ca * cb, "/": ca / cb}[o]
    if isinstance(op, tuple) and op[0] == "if":
        _, cond, a, b = op
        return (F.when(_compile_expr(cond, cols),
                       _operand_col(a, cols))
                .otherwise(_operand_col(b, cols)))
    if isinstance(op, tuple) and op[0] == "fn":
        return _fn_col(op[1], op[2], cols)
    return _term_col(op)


_RDF_LANGSTRING = DEFAULT_PREFIXES["rdf"] + "langString"
_XSD_STRING = DEFAULT_PREFIXES["xsd"] + "string"


def _fn_col(name, args, cols):
    """SPARQL 1.1 §17.4 scalar builtins as pure Column expressions
    (JVM-side, whole-stage codegen — never a Python UDF)."""
    c = [_operand_col(a, cols) for a in args]
    if name == "strlen":
        return F.length(c[0]).cast("long")
    if name == "ucase":
        return F.upper(c[0])
    if name == "lcase":
        return F.lower(c[0])
    if name == "substr":
        # SPARQL SUBSTR is 1-based like F.substring; the 2-arg form
        # runs to the end of the string
        ln = (c[2].cast("int") if len(c) == 3 else F.length(c[0]))
        return F.substring(c[0], c[1].cast("int"), ln)
    if name == "concat":
        return F.concat(*c)
    if name in ("strbefore", "strafter"):
        # instr is 1-based, 0 when absent; SPARQL returns "" for a
        # missing needle, and STRAFTER(x, "") = x / STRBEFORE(x, "")
        # = "" both fall out of instr(x, "") = 1
        pos = F.call_function("instr", c[0], c[1])
        if name == "strbefore":
            hit = F.substring(c[0], F.lit(1), pos - F.lit(1))
        else:
            hit = F.substring(c[0], pos + F.length(c[1]),
                              F.length(c[0]))
        return F.when(pos > 0, hit).otherwise(F.lit(""))
    if name == "replace":
        pat, rep = args[1], args[2]
        if not (isinstance(pat, _Const) and isinstance(rep, _Const)):
            raise SparqlError("REPLACE takes constant pattern and "
                              "replacement")
        # SPARQL REPLACE is regex-based and replaces every occurrence
        return F.regexp_replace(c[0], pat.value, rep.value)
    if name == "coalesce":
        return F.coalesce(*c)
    if name == "abs":
        return F.abs(c[0].cast("double"))
    if name == "ceil":
        return F.ceil(c[0].cast("double")).cast("double")
    if name == "floor":
        return F.floor(c[0].cast("double")).cast("double")
    if name == "round":
        return F.round(c[0].cast("double"), 0)
    if name == "datatype":
        # datatype(?v): rdf:langString for language-tagged literals,
        # the stored datatype else xsd:string for plain literals, and
        # NULL (type error -> unbound) for IRIs.  Needs the hidden
        # term-metadata columns; a variable without them is an IRI by
        # construction (subj/pred position) -> NULL.
        v = args[0]
        if not isinstance(v, _Var):
            raise SparqlError("datatype() takes a variable")
        dt, kd, lg = ("__dt_" + v.name, "__kind_" + v.name,
                      "__lang_" + v.name)
        if not any(c in cols for c in (dt, kd, lg)):
            return F.lit(None).cast("string")
        kindc = (F.coalesce(F.col(kd), F.lit("uri")) if kd in cols
                 else F.lit("lit"))
        langc = (F.coalesce(F.col(lg), F.lit("")) if lg in cols
                 else F.lit(""))
        dtc = (F.col(dt) if dt in cols
               else F.lit(None).cast("string"))
        return F.when(
            kindc == "lit",
            F.when(F.length(langc) > 0, F.lit(_RDF_LANGSTRING))
             .otherwise(F.coalesce(dtc, F.lit(_XSD_STRING))))
    if name in ("iri", "uri"):
        # identity over the string term encoding (IRIs are stored as
        # their IRI string; no base-IRI resolution in this store)
        return c[0]
    if name == "md5":
        return F.md5(c[0])
    if name == "sha1":
        return F.sha1(c[0])
    if name in ("sha256", "sha384", "sha512"):
        return F.sha2(c[0], int(name[3:]))
    if name == "encode_for_uri":
        # SPARQL 1.1 §17.4.3.10 percent-encodes everything outside the
        # RFC 3986 unreserved set with UPPERCASE hex.  Spark's
        # url_encode is form-encoding — fix its three deviations:
        # space -> '+' (must be %20), '~' -> %7E (unreserved), and a
        # raw '*' (must be %2A)
        enc = F.call_function("url_encode", c[0])
        enc = F.regexp_replace(enc, r"\+", "%20")
        enc = F.regexp_replace(enc, "%7E", "~")
        return F.regexp_replace(enc, r"\*", "%2A")
    if name in ("strlang", "strdt"):
        # the VALUE is the lexical form; the language tag / datatype
        # lives in the hidden term-metadata columns, which the BIND
        # compile step attaches (so lang()/datatype()/CONSTRUCT see it)
        return c[0]
    raise SparqlError("unknown function %s" % name)


def _compile_expr(node, cols=()):
    kind = node[0]
    if kind == "or":
        return _compile_expr(node[1], cols) | _compile_expr(node[2], cols)
    if kind == "and":
        return _compile_expr(node[1], cols) & _compile_expr(node[2], cols)
    if kind == "not":
        return ~_compile_expr(node[1], cols)
    if kind == "cmp":
        _, op, a, b = node
        ca, cb = _operand_col(a, cols), _operand_col(b, cols)
        # a bare number TOKEN means a numeric comparison (SPARQL
        # operator semantics); quoted literals stay lexicographic even
        # when digit-shaped ("007" != "7", ?x < "10" is codepoint) —
        # the distinction is the parse-time kind, not the value shape.
        # Arithmetic and numeric-valued builtins force numeric too.
        def is_num(t):
            return ((isinstance(t, _Const) and t.kind == "num")
                    or (isinstance(t, tuple)
                        and (t[0] == "arith"
                             or (t[0] == "fn"
                                 and t[1] in ("strlen", "abs", "ceil",
                                              "floor", "round")))))
        if is_num(a) or is_num(b):
            ca, cb = ca.cast("double"), cb.cast("double")
        return {"=": ca == cb, "!=": ca != cb, "<": ca < cb,
                "<=": ca <= cb, ">": ca > cb, ">=": ca >= cb}[op]
    if kind == "regex":
        return _operand_col(node[1], cols).rlike(node[2].value)
    if kind == "contains":
        return _operand_col(node[1], cols).contains(
            _operand_col(node[2], cols))
    if kind == "strstarts":
        return _operand_col(node[1], cols).startswith(
            _operand_col(node[2], cols))
    if kind == "strends":
        return _operand_col(node[1], cols).endswith(
            _operand_col(node[2], cols))
    if kind == "sameterm":
        # value equality over the string term encoding (the
        # skolemized store has no bnodes; lang/datatype live in
        # hidden columns — sameTerm on the lexical form).  An unbound
        # argument is a SPARQL type error -> the FILTER drops the row,
        # so two NULLs must NOT compare equal.
        ca = _operand_col(node[1], cols)
        cb = _operand_col(node[2], cols)
        return ca.eqNullSafe(cb) & ca.isNotNull()
    if kind == "bound":
        return _term_col(node[1]).isNotNull()
    if kind == "iskind":
        # isURI/isLiteral/isBlank over the hidden __kind_ binding;
        # subj/pred-position variables carry no __kind_ column and are
        # IRIs by RDF construction (the triples model has no blank
        # nodes — skolemized at distill time)
        _, which, v = node
        hidden = "__kind_" + v.name
        col = (F.coalesce(F.col(hidden), F.lit("uri"))
               if hidden in cols else F.lit("uri"))
        return F.lit(False) if which == "blank" else (col == which)
    if kind == "in":
        _, left, terms, neg = node
        col = _operand_col(left, cols).isin([t.value for t in terms])
        return ~col if neg else col
    if kind == "langmatches":
        # primary-strength RFC-4647 basic match: exact tag or prefix
        lang = F.lower(_operand_col(node[1], cols))
        tag = node[2].value.lower()
        return (lang == tag) | lang.startswith(tag + "-")
    if kind == "lang":
        # EBV of lang(?v): _lang_col coalesces the plain-literal NULL
        # tag to '', whose effective boolean value is FALSE — test
        # non-emptiness, not non-NULL (which is vacuously true)
        return F.length(_lang_col(node[1])) > 0
    if kind == "truthy":
        op = node[1]
        if isinstance(op, tuple) and op[0] == "lang":
            return F.length(_lang_col(op[1])) > 0
        return _operand_col(op, cols).isNotNull()
    raise SparqlError("bad filter node %r" % (node,))


# hidden per-variable term metadata: (source column, alias prefix).
# Bound only for obj-position variables and only when the source frame
# carries the column; consumed by lang()/langMatches and CONSTRUCT.
_META = (("obj_lang", "__lang_"), ("obj_datatype", "__dt_"),
         ("obj_kind", "__kind_"))


def _scan(triples: DataFrame, pattern, ctx=None,
          ctx_var=None) -> DataFrame:
    """One BGP triple -> filtered scan with variable columns aliased;
    constant terms (and the enclosing GRAPH context) become pushed-down
    equality filters.  ``ctx_var`` (GRAPH ?g) binds the context column
    as a variable instead."""
    s, p, o = pattern
    df = triples
    if ctx is not None and "context" in triples.columns:
        df = df.where(F.col("context") == ctx.value)
    seen: dict[str, str] = {}
    cols = []
    if ctx_var is not None:
        if "context" not in triples.columns:
            raise SparqlError("GRAPH ?var needs a context column")
        df = df.where(F.col("context").isNotNull())
        seen[ctx_var] = "context"
        cols.append(F.col("context").alias(ctx_var))
    for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
        if isinstance(term, _Var):
            if term.name in seen:       # e.g. ?x ?p ?x
                df = df.where(F.col(col) == F.col(seen[term.name]))
            else:
                seen[term.name] = col
                cols.append(F.col(col).alias(term.name))
                if col == "obj":
                    for src, pfx in _META:
                        if src in triples.columns:
                            cols.append(F.col(src)
                                        .alias(pfx + term.name))
        else:
            df = df.where(F.col(col) == term.value)
    if not cols:
        # all-constant pattern: existence check -> 1-row marker frame
        return df.limit(1).select(F.lit(1).alias("__exists"))
    return df.select(*cols)


# fixpoint bound for property paths: part/annotation hierarchies are
# shallow (SURVEY.md J3); a graph needing more rounds than this is not
# the shape the reference queries, so fail loudly instead of looping
_MAX_PATH_ITER = 32
# Budget on materialized (subj, obj) closure pairs for var-var paths:
# the closure is worst-case quadratic in reachable nodes, so an
# adversarial deep/dense graph could otherwise grow the fixpoint
# unboundedly before the iteration cap bites.  Crossing the budget
# raises SparqlError instead of running away; callers with genuinely
# huge-but-intended closures can raise it (module attribute).
PATH_PAIR_BUDGET = 5_000_000


def _path_edges(triples: DataFrame, p, ctx, ctx_var=None) -> DataFrame:
    """Edge relation for one path step.  Under GRAPH ?var the edges
    keep their named-graph id as a ``__pctx`` key column, so the
    closure/BFS fixpoints below stay within each graph (a path never
    crosses graph boundaries, per SPARQL per-named-graph scoping)."""
    df = triples
    if ctx is not None and "context" in triples.columns:
        df = df.where(F.col("context") == ctx.value)
    extra = []
    if ctx_var is not None:
        if "context" not in triples.columns:
            raise SparqlError("GRAPH ?var needs a context column")
        df = df.where(F.col("context").isNotNull())
        extra = [F.col("context").alias("__pctx")]
    if isinstance(p, tuple) and p[0] == "nps":
        # negated-property-set edge relation under a path modifier:
        # forward edges whose pred is outside the forward member set,
        # plus reversed edges whose pred is outside the inverse set
        _, fwd, bwd = p
        parts = []
        if fwd:
            parts.append(df.where(~F.col("pred").isin(
                [t.value for t in fwd])).select("subj", "obj", *extra))
        if bwd:
            parts.append(df.where(~F.col("pred").isin(
                [t.value for t in bwd]))
                .select(F.col("obj").alias("subj"),
                        F.col("subj").alias("obj"), *extra))
        out = parts[0]
        for q in parts[1:]:
            out = out.unionByName(q)
        return out.distinct().localCheckpoint()
    return (df.where(F.col("pred") == p.value)
            .select("subj", "obj", *extra).distinct().localCheckpoint())


def _path_reach(edges: DataFrame, start: str, forward: bool) -> DataFrame:
    """Nodes reachable from ``start`` over >= 1 edge (the ``+`` set;
    ``*`` adds {start} back).  Broadcast-frontier BFS: the frontier is
    small relative to the edge table, so each round is one broadcast
    join + anti-join, O(diameter) rounds, lineage cut per round."""
    here, there = ("subj", "obj") if forward else ("obj", "subj")
    ctxed = "__pctx" in edges.columns
    keep = [edges[there].alias("n")] + (
        [edges["__pctx"]] if ctxed else [])
    spark = edges.sparkSession
    start_df = spark.createDataFrame([(start,)], "n string")
    reach = (edges.join(F.broadcast(start_df),
                        edges[here] == start_df["n"])
             .select(*keep).distinct()
             .localCheckpoint())
    prev = reach.count()
    for _ in range(_MAX_PATH_ITER):
        if prev == 0:
            return reach
        cond = edges[here] == reach["n"]
        if ctxed:
            cond = cond & (edges["__pctx"] == reach["__pctx"])
        step = edges.join(F.broadcast(reach), cond).select(*keep)
        reach = reach.unionByName(step).distinct().localCheckpoint()
        cur = reach.count()
        if cur == prev:
            return reach
        prev = cur
    raise SparqlError("property path exceeded %d iterations"
                      % _MAX_PATH_ITER)


def _closure_pairs(edges: DataFrame) -> DataFrame:
    """Transitive-closure (subj, obj) pairs (>= 1 edge): fixpoint of
    closure ∘ edges with count-based convergence — the same loop shape
    as graphs.ispartof_closure (one shuffle join + one distinct per
    round, lineage cut per round).  Worst case quadratic in reachable
    pairs — correct and cheap for the bounded-diameter hierarchies the
    reference's path queries walk.  (An anti-join semi-naive delta
    would re-shuffle less per round, but Spark 4.1's union constraint
    rewrite miscompiles the anti-join-into-self-union cycle —
    NoSuchElementException on attribute ids — so the fixpoint is
    expressed the proven way.)"""
    ctxed = "__pctx" in edges.columns
    paths = edges
    prev = paths.count()
    for _ in range(_MAX_PATH_ITER):
        cond = F.col("c.obj") == F.col("e.subj")
        if ctxed:
            cond = cond & (F.col("c.__pctx") == F.col("e.__pctx"))
        sel = [F.col("c.subj").alias("subj"),
               F.col("e.obj").alias("obj")] + (
            [F.col("c.__pctx").alias("__pctx")] if ctxed else [])
        step = (paths.alias("c")
                .join(edges.alias("e"), cond)
                .select(*sel))
        paths = (paths.unionByName(step).distinct().localCheckpoint())
        cur = paths.count()
        if cur == prev:
            return paths
        if cur > PATH_PAIR_BUDGET:
            raise SparqlError(
                "property-path closure exceeded the %d-pair budget "
                "(%d pairs so far); narrow the path or raise "
                "sparql.PATH_PAIR_BUDGET" % (PATH_PAIR_BUDGET, cur))
        prev = cur
    raise SparqlError("property path exceeded %d iterations"
                      % _MAX_PATH_ITER)


def _path_scan(triples: DataFrame, payload, ctx=None,
               ctx_var=None) -> DataFrame:
    """One `s p*`/`p+` o pattern -> DataFrame of solutions.  Zero-or-
    more includes the zero-length path per SPARQL 1.1: a constant
    endpoint always matches itself; var-var adds the identity pair for
    every term in the (ctx-scoped) graph.  Under GRAPH ?var the
    fixpoints run per named graph (edges carry a ``__pctx`` key) and
    every solution also binds ``ctx_var`` to its graph id."""
    s, p, mod, o = payload
    edges = _path_edges(triples, p, ctx, ctx_var)
    ctx_cols = ([F.col("__pctx").alias(ctx_var)]
                if ctx_var is not None else [])

    def ident_pairs():
        # zero-length path endpoints: every term of the (ctx-scoped)
        # graph paired with itself — per graph under GRAPH ?var
        df = triples
        if ctx is not None and "context" in triples.columns:
            df = df.where(F.col("context") == ctx.value)
        if ctx_var is not None:
            df = df.where(F.col("context").isNotNull())
            terms = (df.select(F.col("subj").alias("n"),
                               F.col("context").alias("__pctx"))
                     .unionByName(
                         df.select(F.col("obj").alias("n"),
                                   F.col("context").alias("__pctx")))
                     .distinct())
            return terms.select(F.col("n").alias("subj"),
                                F.col("n").alias("obj"), "__pctx")
        terms = (df.select(F.col("subj").alias("n"))
                 .unionByName(df.select(F.col("obj").alias("n")))
                 .distinct())
        return terms.select(F.col("n").alias("subj"),
                            F.col("n").alias("obj"))

    def all_ctx():
        # every named graph id (for zero-length matches, which hold
        # in any graph regardless of term membership)
        return (triples.where(F.col("context").isNotNull())
                .select(F.col("context").alias("__pctx")).distinct())

    if isinstance(s, _Var) and isinstance(o, _Var):
        pairs = edges if mod == "?" else _closure_pairs(edges)
        if mod in ("*", "?"):
            pairs = pairs.unionByName(ident_pairs()).distinct()
        if s.name == o.name:                      # ?x p* ?x
            return (pairs.where(F.col("subj") == F.col("obj"))
                    .select(F.col("subj").alias(s.name), *ctx_cols))
        return pairs.select(F.col("subj").alias(s.name),
                            F.col("obj").alias(o.name), *ctx_cols)
    if isinstance(s, _Var) or isinstance(o, _Var):
        # constant endpoint: BFS backward from a constant object
        # (`?s p* <O>`, the annotations.rq shape) or forward from a
        # constant subject
        if isinstance(s, _Var):
            start, forward, var = o.value, False, s.name
        else:
            start, forward, var = s.value, True, o.name
        spark = edges.sparkSession
        start_df = spark.createDataFrame([(start,)], "n string")
        if mod == "?":
            here, there = ("subj", "obj") if forward else ("obj", "subj")
            keep = [edges[there].alias("n")] + (
                [edges["__pctx"]] if ctx_var is not None else [])
            reach = (edges.join(F.broadcast(start_df),
                                edges[here] == start_df["n"])
                     .select(*keep).distinct())
        else:
            reach = _path_reach(edges, start, forward)
        if mod in ("*", "?"):
            if ctx_var is not None:
                zero = (all_ctx()
                        .select(F.lit(start).alias("n"), "__pctx"))
                reach = reach.unionByName(zero).distinct()
            else:
                reach = (reach.unionByName(start_df.select("n"))
                         .distinct())
        return reach.select(F.col("n").alias(var), *ctx_cols)
    # both constant
    if ctx_var is not None:
        # GRAPH ?g { <s> p+ <o> }: bind ?g to the graphs where the
        # path holds
        if mod in ("*", "?") and s.value == o.value:
            return all_ctx().select(F.col("__pctx").alias(ctx_var))
        if mod == "?":
            hits = (edges.where((F.col("subj") == s.value)
                                & (F.col("obj") == o.value))
                    .select("__pctx").distinct())
        else:
            reach = _path_reach(edges, s.value, forward=True)
            hits = (reach.where(F.col("n") == o.value)
                    .select("__pctx").distinct())
        return hits.select(F.col("__pctx").alias(ctx_var))
    # existence check -> 0/1-row marker frame
    if mod in ("*", "?") and s.value == o.value:
        hit = True
    elif mod == "?":
        hit = (edges.where((F.col("subj") == s.value)
                           & (F.col("obj") == o.value))
               .limit(1).count() > 0)
    else:
        reach = _path_reach(edges, s.value, forward=True)
        hit = reach.where(F.col("n") == o.value).limit(1).count() > 0
    return (edges.sparkSession.range(1 if hit else 0)
            .select(F.lit(1).alias("__exists")))


def _apply_values(triples: DataFrame, plan, names, rows):
    """Join an inline VALUES block into the plan.  Rows without UNDEF
    join as a plain broadcast inner join; UNDEF cells follow SPARQL
    solution compatibility (compatible with ANY binding), compiled as
    a generalized join with coalesced output."""
    shared_pre = (set(plan.columns) if plan is not None
                  else set()) & set(names)
    undef_shared = any(
        t is None and name in shared_pre
        for row in rows for name, t in zip(names, row))
    data = [[None if t is None else t.value for t in row]
            for row in rows]
    vdf = triples.sparkSession.createDataFrame(
        data, ", ".join("%s string" % n for n in names))
    if not undef_shared:
        return _join(plan, F.broadcast(vdf), "inner")
    v2 = vdf.select(*[F.col(n).alias("__v_" + n) for n in names])
    cond = None
    for c in sorted(shared_pre):
        this = ((plan[c] == v2["__v_" + c])
                | v2["__v_" + c].isNull()
                | plan[c].isNull())
        cond = this if cond is None else (cond & this)
    joined = plan.join(F.broadcast(v2), cond, "inner")
    out_cols = []
    for c in plan.columns:
        if c in shared_pre:
            out_cols.append(F.coalesce(plan[c], v2["__v_" + c])
                            .alias(c))
        else:
            out_cols.append(plan[c])
    for n in names:
        if n not in shared_pre:
            out_cols.append(v2["__v_" + n].alias(n))
    return joined.select(*out_cols)


def _compile_group(triples: DataFrame, items, ctx=None,
                   ctx_var=None) -> DataFrame:
    plan = None
    deferred_values = []
    for kind, payload in items:
        if kind == "triple":
            scan = _scan(triples, payload, ctx, ctx_var)
            plan = _join(plan, scan, "inner")
        elif kind == "path":
            scan = _path_scan(triples, payload, ctx, ctx_var)
            plan = _join(plan, scan, "inner")
        elif kind == "subquery":
            sub = _run_select(triples, payload, outer_ctx=ctx,
                              ctx_var=ctx_var)
            plan = _join(plan, sub, "inner")
        elif kind == "exists":
            # FILTER [NOT] EXISTS { group }: a semi/anti join of the
            # current bindings against the sub-group on shared
            # variables (equi semantics: an unbound/NULL shared var
            # never matches — documented simplification of SPARQL's
            # substitution rule, exact for bound bindings)
            neg, sub_items = payload
            if plan is None:
                raise SparqlError("FILTER EXISTS cannot open a group")
            sub = _compile_group(triples, sub_items, ctx,
                                 ctx_var).drop("__exists")
            shared = [c for c in plan.columns
                      if c in sub.columns and not c.startswith("__")]
            if shared:
                plan = plan.join(sub.select(*shared), shared,
                                 "left_anti" if neg else "left_semi")
            else:
                # no shared variables: the sub-group is a global
                # existence test
                if (sub.limit(1).count() > 0) == neg:
                    plan = plan.limit(0)
        elif kind == "minus":
            if plan is None:
                raise SparqlError("MINUS cannot open a group")
            sub = _compile_group(triples, payload, ctx,
                                 ctx_var).drop("__exists")
            shared = [c for c in plan.columns
                      if c in sub.columns and not c.startswith("__")]
            # SPARQL §8.3.3: disjoint variable domains remove nothing
            if shared:
                plan = plan.join(sub.select(*shared), shared,
                                 "left_anti")
        elif kind == "graph":
            g_ctx, g_items = payload
            if isinstance(g_ctx, _Var):
                # GRAPH ?g { ... }: the context column becomes a
                # REAL variable on every scan in the sub-group; joins
                # between patterns then also unify on the graph —
                # SPARQL's per-named-graph scoping
                sub = _compile_group(triples, g_items,
                                     ctx_var=g_ctx.name)
            else:
                sub = _compile_group(triples, g_items, ctx=g_ctx)
            plan = _join(plan, sub, "inner")
        elif kind == "bind":
            operand, name = payload
            if plan is None:
                raise SparqlError("BIND cannot open a group")
            if name in plan.columns:
                raise SparqlError("BIND to already-bound ?%s" % name)
            plan = plan.withColumn(
                name, _operand_col(operand, tuple(plan.columns)))
            # a plain variable alias carries its term metadata so
            # CONSTRUCT keeps fidelity for the new name
            if isinstance(operand, _Var):
                for _, pfx in _META:
                    src = pfx + operand.name
                    if src in plan.columns:
                        plan = plan.withColumn(pfx + name, F.col(src))
            # STRLANG/STRDT construct a literal: the tag/datatype
            # becomes the new variable's hidden term metadata
            if (isinstance(operand, tuple) and operand[0] == "fn"
                    and operand[1] in ("strlang", "strdt")):
                tag = operand[2][1]
                if not isinstance(tag, _Const):
                    raise SparqlError("%s takes a constant tag"
                                      % operand[1].upper())
                pfx = ("__lang_" if operand[1] == "strlang"
                       else "__dt_")
                plan = (plan.withColumn(pfx + name, F.lit(tag.value))
                        .withColumn("__kind_" + name, F.lit("lit")))
        elif kind == "values":
            names, rows = payload
            has_undef = any(t is None for row in rows for t in row)
            bound = set(plan.columns) if plan is not None else set()
            if has_undef and not set(names) <= bound:
                # an UNDEF cell must act as a wildcard against vars
                # the group binds LATER too (SPARQL joins are
                # commutative under solution compatibility) — defer
                # the block to the end of the group, when every
                # binding exists, instead of letting a NULL cell hit
                # a later equi join and silently drop solutions
                deferred_values.append((names, rows))
            else:
                plan = _apply_values(triples, plan, names, rows)
        elif kind == "union":
            subs = [_compile_group(triples, b, ctx, ctx_var)
                    for b in payload]
            # SPARQL union: solutions of every branch; variables
            # absent from a branch are unbound (NULL)
            allcols = []
            for sub in subs:
                for c in sub.columns:
                    if c not in allcols:
                        allcols.append(c)
            aligned = [
                sub.select(*[
                    F.col(c) if c in sub.columns
                    else F.lit(None).cast("string").alias(c)
                    for c in allcols])
                for sub in subs]
            merged = aligned[0]
            for sub in aligned[1:]:
                merged = merged.unionByName(sub)
            plan = _join(plan, merged, "inner")
        elif kind == "optional":
            sub = _compile_group(triples, payload, ctx, ctx_var)
            if plan is None:
                raise SparqlError("OPTIONAL cannot open a group")
            sub = _drop_dup_hidden(plan, sub)
            shared = [c for c in plan.columns if c in sub.columns]
            if not shared:
                raise SparqlError("OPTIONAL shares no variables")
            plan = plan.join(sub, shared, "left")
        elif kind == "filter":
            if plan is None:
                raise SparqlError("FILTER before any pattern")
            plan = plan.where(_compile_expr(payload, plan.columns))
    for names, rows in deferred_values:
        plan = _apply_values(triples, plan, names, rows)
    if plan is None:
        raise SparqlError("empty group")
    return plan


_META_PREFIXES = ("__lang_", "__dt_", "__kind_")


def _drop_dup_hidden(plan, scan):
    """A variable bound at obj position in two patterns would carry
    its hidden metadata twice; the first binding wins (joins are on
    the VALUE, per SPARQL solution compatibility).  Only the term-
    metadata columns are dropped — desugared path variables (__pN)
    are REAL join variables and must survive."""
    dups = [c for c in scan.columns
            if c.startswith(_META_PREFIXES) and c in plan.columns]
    return scan.drop(*dups) if dups else scan


def _join(plan, scan, how):
    if plan is None:
        return scan
    scan = _drop_dup_hidden(plan, scan)
    shared = [c for c in plan.columns if c in scan.columns]
    if shared:
        return plan.join(scan, shared, how)
    return plan.crossJoin(scan)


def _agg_expr(fn, distinct, arg, cols=()):
    if arg is None:
        col = None
    elif isinstance(arg, str):
        col = F.col(arg)
    else:                       # expression argument (parse node)
        col = _operand_col(arg, cols)
    if isinstance(fn, tuple):            # ("group_concat", separator)
        _, sep = fn
        inner = F.collect_set(col) if distinct else F.collect_list(col)
        # SPARQL 1.1 leaves GROUP_CONCAT order unspecified; sorting
        # the collected values makes the result deterministic (and
        # identical across engines/partitionings)
        return F.array_join(F.array_sort(inner), sep)
    if fn == "count":
        # COUNT(?v) counts bound values; COUNT(*) counts solutions
        return (F.countDistinct(col) if distinct
                else F.count(col) if col is not None
                else F.count(F.lit(1)))
    if fn == "sum":
        num = col.cast("double")
        return F.sum_distinct(num) if distinct else F.sum(num)
    if fn == "avg":
        # no avg_distinct builtin: Spark SQL's avg(DISTINCT ...) —
        # still one hash aggregate with a distinct pre-step
        return (F.expr("avg(DISTINCT cast(`%s` as double))" % arg)
                if distinct else F.avg(col.cast("double")))
    if fn == "max":
        return F.max(col)           # DISTINCT is a no-op for min/max
    return F.min(col)               # min | sample


def _per_graph_limit(plan: DataFrame, ctx_var, order, n) -> DataFrame:
    """LIMIT inside a GRAPH ?var subquery applies per named graph
    (each graph's evaluation is limited independently before the
    union): row_number window partitioned by the graph id.  Without
    ORDER BY, SPARQL allows any n-subset; ordering by the output
    columns makes the choice deterministic."""
    from pyspark.sql import Window
    order_cols = [F.col(v).asc() if asc else F.col(v).desc()
                  for v, asc in order]
    if not order_cols:
        order_cols = [F.col(c).asc() for c in plan.columns
                      if c != ctx_var and not c.startswith("__")]
    if not order_cols:
        order_cols = [F.lit(1).asc()]
    w = Window.partitionBy(ctx_var).orderBy(*order_cols)
    return (plan.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def _select_aggregated(plan: DataFrame, ast, ctx_var=None) -> DataFrame:
    """GROUP BY / aggregate tail of a SELECT (triplestore.py:138-173
    passthrough + the :653-666 COUNT probes): one ``groupBy().agg()``
    — map-side partial aggregation, a single shuffle on the grouping
    keys.  SAMPLE() is implementation-defined per SPARQL 1.1; min() is
    the deterministic choice here.  Under GRAPH ?var the graph id is
    an implicit extra grouping key (aggregation is per named graph)
    and is carried through the projection."""
    sel, groupby = ast["select"], ast["groupby"]
    if ctx_var is not None and ctx_var not in groupby:
        groupby = groupby + [ctx_var]
    if sel is None:
        raise SparqlError("SELECT * cannot be combined with GROUP BY")
    plain = [it[1] for it in sel if it[0] == "var"]
    bad = [v for v in plain if v not in groupby]
    if bad:
        raise SparqlError("SELECT of non-grouped vars: %s" % bad)
    missing = [v for v in groupby
               + [it[3] for it in sel
                  if it[0] == "agg" and isinstance(it[3], str)]
               if v not in plan.columns]
    if missing:
        raise SparqlError("aggregate/GROUP BY of unbound vars: %s"
                          % missing)
    pcols = tuple(plan.columns)
    aggex = [_agg_expr(it[1], it[2], it[3], pcols).alias(it[4])
             for it in sel if it[0] == "agg"]
    # HAVING: aggregate calls in the expression become hidden columns
    # of the SAME groupBy().agg() (no second shuffle), then a plain
    # filter over the aggregated frame; output aliases are referenced
    # directly as ?alias
    having, hidden = ast.get("having"), []

    def _rewrite_having(node):
        if isinstance(node, tuple) and node and node[0] == "aggop":
            _, fn, distinct, arg = node
            if isinstance(arg, str) and arg not in plan.columns:
                raise SparqlError("HAVING aggregate of unbound var "
                                  "?%s" % arg)
            alias = "__having_%d" % len(hidden)
            hidden.append(_agg_expr(fn, distinct, arg,
                                    tuple(plan.columns)).alias(alias))
            return _Var(alias)
        if isinstance(node, tuple):
            return tuple(_rewrite_having(x) for x in node)
        if isinstance(node, list):
            return [_rewrite_having(x) for x in node]
        return node

    if having is not None:
        having = _rewrite_having(having)
    if aggex or hidden:
        plan = (plan.groupBy(*groupby).agg(*aggex, *hidden) if groupby
                else plan.agg(*aggex, *hidden))
    else:
        plan = plan.select(*groupby).distinct()
    if having is not None:
        plan = plan.where(_compile_expr(having, plan.columns))
    outcols = [it[1] if it[0] == "var" else it[4] for it in sel]
    if ctx_var is not None and ctx_var not in outcols:
        outcols = outcols + [ctx_var]
    bad = [v for v, _ in ast["order"]
           if v not in groupby and v not in outcols]
    if bad:
        raise SparqlError("ORDER BY on non-output vars after "
                          "grouping: %s" % bad)
    # a distinct() shuffle after orderBy would destroy the requested
    # order (and with LIMIT, return an arbitrary subset): with
    # DISTINCT, dedupe first and order only on selected columns;
    # without it, order may still use grouped-but-unselected vars
    order_cols = [F.col(v).asc() if asc else F.col(v).desc()
                  for v, asc in ast["order"]]
    if ast["distinct"]:
        bad = [v for v, _ in ast["order"] if v not in outcols]
        if bad:
            raise SparqlError(
                "ORDER BY on non-selected vars with DISTINCT: %s"
                % bad)
        plan = plan.select(*outcols).distinct()
        if order_cols:
            plan = plan.orderBy(*order_cols)
    else:
        if order_cols:
            plan = plan.orderBy(*order_cols)
        plan = plan.select(*outcols)
    if ast["limit"] is not None:
        if ctx_var is not None:
            plan = _per_graph_limit(plan, ctx_var, ast["order"],
                                    ast["limit"])
        else:
            plan = plan.limit(ast["limit"])
    return plan


def sparql_ask(triples: DataFrame, query: str) -> bool:
    """Compile and run a SPARQL ASK: True iff the pattern has at least
    one solution.  The plan is the same as the SELECT plan with a
    LIMIT 1 early-out — Spark stops the scan after the first matching
    row reaches the driver."""
    p = _Parser(_tokenize(query))
    p._prefixes_decl()
    p.expect("ask")
    if p.peek() and p.peek().lower() == "where":
        p.next()
    plan = _compile_group(triples, p.group())
    if p.peek() is not None:
        raise SparqlError("trailing tokens at %r" % p.peek())
    return plan.limit(1).count() > 0


def sparql_describe(triples: DataFrame, query: str) -> DataFrame:
    """Compile and run a SPARQL DESCRIBE: the concise bounded
    description of each described resource.  The triples model is
    skolemized (no blank nodes), so the CBD is exactly the resource's
    outgoing triples — one broadcast semi-join against the (small)
    described-resource set.  Forms: ``DESCRIBE <iri> ...``,
    ``DESCRIBE ?v [?w ...] WHERE { ... }``, and the mixed
    ``DESCRIBE <iri> ?v WHERE { ... }`` (SPARQL 1.1 §16.4: constant
    IRIs are described unconditionally, variables via their WHERE
    bindings; the reference's own describe-*.rq templates are
    CONSTRUCT queries — this covers the triplestore's ad-hoc DESCRIBE
    surface)."""
    p = _Parser(_tokenize(query))
    p._prefixes_decl()
    p.expect("describe")
    terms = []
    while p.peek() is not None and p.peek().lower() != "where":
        terms.append(p.term())
    if not terms:
        raise SparqlError("empty DESCRIBE")
    spark = triples.sparkSession
    var_terms = [t for t in terms if isinstance(t, _Var)]
    iri_terms = [t for t in terms if not isinstance(t, _Var)]
    cols = []
    if p.peek() is not None:
        # SPARQL 1.1 §16.4: the described resources are the listed
        # IRIs plus, for each listed variable, its distinct bindings
        # over the WHERE solutions (constant IRIs are described
        # unconditionally, even when the group has no solutions)
        p.next()
        plan = _compile_group(triples, p.group()).drop("__exists")
        for t in var_terms:
            if t.name not in plan.columns:
                raise SparqlError("DESCRIBE of unbound var ?%s" % t.name)
            cols.append(plan.select(F.col(t.name).alias("__desc")))
    elif var_terms:
        raise SparqlError("DESCRIBE ?var needs a WHERE group")
    if iri_terms:
        cols.append(spark.createDataFrame(
            [(t.value,) for t in iri_terms], "__desc string"))
    subjects = cols[0]
    for c in cols[1:]:
        subjects = subjects.unionByName(c)
    subjects = subjects.where(F.col("__desc").isNotNull()).distinct()
    if p.peek() is not None:
        # unconsumed tokens would be silently dropped (a LIMIT here
        # has no defined CBD semantics) — fail loudly like
        # sparql_select does
        raise SparqlError("trailing tokens at %r" % p.peek())
    return (triples.join(F.broadcast(subjects),
                         triples["subj"] == subjects["__desc"], "semi")
            .select(*triples.columns))


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Compile and run a SPARQL SELECT against the triples DataFrame.

    Returns a DataFrame whose columns are the selected variables (in
    SELECT order; unbound OPTIONAL variables are NULL, matching SPARQL
    semantics)."""
    ast = _Parser(_tokenize(query)).parse()
    return _run_select(triples, ast)


def _run_select(triples: DataFrame, ast, outer_ctx=None,
                ctx_var=None) -> DataFrame:
    """Execute a parsed SELECT ast; also the subquery evaluator (a
    subquery without its own FROM inherits the enclosing constant
    graph context, per SPARQL's dataset scoping).  Under GRAPH ?var
    (``ctx_var``) the subquery is evaluated per named graph — the
    graph id is carried through projection/DISTINCT/aggregation as an
    implicit key, and LIMIT applies per graph (SPARQL algebra:
    Graph(?g, P) = union over g of Join(eval(D(g), P), {?g -> g}))."""
    ctx = ast["from"] if ast["from"] is not None else outer_ctx
    if ctx_var is not None and ast["from"] is not None:
        # a FROM-scoped subquery has its own constant dataset; mixing
        # it with per-named-graph evaluation has no SPARQL reading
        raise SparqlError("subquery with FROM inside GRAPH ?var")
    plan = _compile_group(triples, ast["group"], ctx=ctx,
                          ctx_var=ctx_var)
    plan = plan.drop("__exists")
    order_cols = [F.col(v).asc() if asc else F.col(v).desc()
                  for v, asc in ast["order"]]
    sel, groupby = ast["select"], ast["groupby"]
    if groupby or ast.get("having") is not None \
            or (sel is not None
                and any(it[0] == "agg" for it in sel)):
        return _select_aggregated(plan, ast, ctx_var=ctx_var)
    if sel is not None:
        names = [it[1] for it in sel]
        if ctx_var is not None and ctx_var not in names:
            names = names + [ctx_var]
        ast = dict(ast, select=names)
        missing = [v for v in ast["select"] if v not in plan.columns]
        if missing:
            raise SparqlError("SELECT of unbound vars: %s" % missing)
        if ast["distinct"]:
            # SPARQL: with DISTINCT, ORDER BY may only use selected
            # variables (ordering rows that no longer exist is
            # undefined)
            bad = [v for v, _ in ast["order"]
                   if v not in ast["select"]]
            if bad:
                raise SparqlError(
                    "ORDER BY on non-selected vars with DISTINCT: %s"
                    % bad)
            plan = plan.select(*ast["select"]).distinct()
            if order_cols:
                plan = plan.orderBy(*order_cols)
        else:
            # order on the full binding set, THEN project — ORDER BY
            # may reference vars that are not selected
            if order_cols:
                plan = plan.orderBy(*order_cols)
            plan = plan.select(*ast["select"])
    else:
        plan = plan.drop(*[c for c in plan.columns
                           if c.startswith("__")])
        if ast["distinct"]:
            plan = plan.distinct()
        if order_cols:
            plan = plan.orderBy(*order_cols)
    if ast["limit"] is not None:
        if ctx_var is not None:
            plan = _per_graph_limit(plan, ctx_var, ast["order"],
                                    ast["limit"])
        else:
            plan = plan.limit(ast["limit"])
    return plan


def sparql_construct(triples: DataFrame, query: str,
                     with_term_meta: bool = False) -> DataFrame:
    """Compile and run a SPARQL CONSTRUCT: the WHERE group binds
    variables, then each template pattern emits one (subj, pred, obj)
    row per solution (variables substituted, constants as literals),
    distinct over the union — the triplestore.construct surface
    (reference triplestore.py:160-173).

    ``with_term_meta=True`` adds (obj_kind, obj_lang, obj_datatype):
    obj-position variable bindings carry the source row's term
    metadata through the join (hidden columns), so the constructed
    graph preserves IRI-vs-literal, language tags and datatypes — the
    fidelity rdflib graph comparison needs."""
    ast = _Parser(_tokenize(query)).parse_construct()
    return _instantiate_template(triples, ast["template"],
                                 ast["group"], with_term_meta)


def _instantiate_template(triples: DataFrame, template, group,
                          with_term_meta: bool = False) -> DataFrame:
    """CONSTRUCT-style template instantiation against a WHERE group —
    shared by CONSTRUCT and the UPDATE forms (DELETE/INSERT ...
    WHERE)."""
    plan = _compile_group(triples, group).drop("__exists")

    def meta(term, pfx, dflt):
        if isinstance(term, _Var):
            col = pfx + term.name
            if col in plan.columns:
                return F.col(col)
            return F.lit("uri") if pfx == "__kind_" \
                else F.lit(None).cast("string")
        return F.lit(dflt).cast("string")

    outs = []
    for s, p, o in template:
        pat = plan
        for term in (s, p, o):
            if isinstance(term, _Var):
                if term.name not in plan.columns:
                    raise SparqlError("CONSTRUCT of unbound var ?%s"
                                      % term.name)
                # SPARQL 1.1 §10.2: template instantiations with an
                # unbound variable (NULL from OPTIONAL / UNION
                # branches, as in annotations.rq) are skipped for
                # that template triple only
                pat = pat.where(F.col(term.name).isNotNull())
        cols = [_term_col(s).alias("subj"),
                _term_col(p).alias("pred"),
                _term_col(o).alias("obj")]
        if with_term_meta:
            cols += [meta(o, "__kind_",
                          ("lit" if o.kind == "num" else o.kind)
                          if isinstance(o, _Const) else None)
                     .alias("obj_kind"),
                     meta(o, "__lang_", None).alias("obj_lang"),
                     meta(o, "__dt_", None).alias("obj_datatype")]
        outs.append(pat.select(*cols))
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.distinct()


# The reference's shipped annotation query (res/sparql/annotations.rq:1-20,
# run per document by construct_annotations, documentrepository.py:2594-2611):
# everything said about any part of the document, plus everything said
# about resources that reference those parts.
ANNOTATIONS_RQ = """
PREFIX dcterms: <http://purl.org/dc/terms/>
CONSTRUCT {
   ?part dcterms:isReferencedBy ?s .
   ?s ?p ?o .
}
WHERE {
  ?s ?p ?o .
  { ?s dcterms:isPartOf* <%(uri)s> . }
  UNION
  { ?part dcterms:isPartOf* <%(uri)s> .
    ?s dcterms:references ?part . }
}
"""


def construct_annotations(triples: DataFrame, uri: str,
                          with_term_meta: bool = False) -> DataFrame:
    """The per-document annotation graph through the SPARQL compiler —
    the construct_annotations surface (documentrepository.py:2594-2611
    + res/sparql/annotations.rq).  The ``isPartOf*`` paths run as
    broadcast-frontier BFS from ``uri`` (O(part-tree depth) rounds)."""
    return sparql_construct(triples, ANNOTATIONS_RQ % {"uri": uri},
                            with_term_meta=with_term_meta)


# ------------------------------------------------------------- UPDATE

def _parse_template_block(p: _Parser):
    p.expect("{")
    template = []
    while p.peek() != "}":
        template.append((p.term(), p.term(), p.term()))
        if p.peek() == ".":
            p.next()
    p.next()
    return template


def _parse_data_quads(p: _Parser):
    """An INSERT/DELETE DATA block: ground triples, optionally inside
    ``GRAPH <iri> { ... }`` sub-blocks (quads — our model is
    context-columned).  Returns 6-col rows; triples outside a GRAPH
    block get a NULL context (default graph).  Typed-literal DATA
    syntax is not tokenized (documented)."""

    def _ground(s, pr, o, ctx):
        if any(isinstance(t, _Var) for t in (s, pr, o)):
            raise SparqlError("DATA blocks take ground triples only")
        if s.kind != "uri" or pr.kind != "uri":
            raise SparqlError("DATA subject/predicate must be IRIs")
        return (s.value, pr.value, o.value, None, None, ctx)

    p.expect("{")
    rows = []
    while p.peek() != "}":
        if p.peek() and p.peek().lower() == "graph":
            p.next()
            g = p.term()
            if isinstance(g, _Var) or g.kind != "uri":
                raise SparqlError("GRAPH in DATA takes a constant IRI")
            p.expect("{")
            while p.peek() != "}":
                rows.append(_ground(p.term(), p.term(), p.term(),
                                    g.value))
                if p.peek() == ".":
                    p.next()
            p.next()
        else:
            rows.append(_ground(p.term(), p.term(), p.term(), None))
        if p.peek() == ".":
            p.next()
    p.next()
    if not rows:
        raise SparqlError("empty DATA block")
    return rows


def parse_update(query: str):
    """Parse a SPARQL UPDATE request into a list of operations:
    ``("insert_data", rows)`` | ``("delete_data", rows)`` |
    ``("modify", (delete_template|None, insert_template|None,
    where_group))``.  Forms: INSERT DATA, DELETE DATA, DELETE WHERE,
    DELETE {..} [INSERT {..}] WHERE {..}, INSERT {..} WHERE {..};
    multiple operations chain with ``;``.  DATA blocks may scope
    triples with ``GRAPH <iri> { ... }`` (quads).  Unsupported:
    GRAPH-scoped templates in the modify form, LOAD/CLEAR/DROP (the
    catalog owns table lifecycle)."""
    p = _Parser(_tokenize(query))
    ops = []
    while True:
        p._prefixes_decl()
        t = p.peek()
        if t is None:
            break
        tl = t.lower()
        if tl == "insert":
            p.next()
            if p.peek() and p.peek().lower() == "data":
                p.next()
                ops.append(("insert_data", _parse_data_quads(p)))
            else:
                ins = _parse_template_block(p)
                p.expect("where")
                ops.append(("modify", (None, ins, p.group())))
        elif tl == "delete":
            p.next()
            nxt = p.peek().lower() if p.peek() else ""
            if nxt == "data":
                p.next()
                ops.append(("delete_data", _parse_data_quads(p)))
            elif nxt == "where":
                # DELETE WHERE: the group is both pattern and template
                p.next()
                group = p.group()
                tmpl = [pl for k, pl in group if k == "triple"]
                if not tmpl or any(k != "triple" for k, _ in group):
                    raise SparqlError(
                        "DELETE WHERE takes a plain BGP")
                ops.append(("modify", (tmpl, None, group)))
            else:
                dele = _parse_template_block(p)
                ins = None
                if p.peek() and p.peek().lower() == "insert":
                    p.next()
                    ins = _parse_template_block(p)
                p.expect("where")
                ops.append(("modify", (dele, ins, p.group())))
        else:
            raise SparqlError("bad update operation %r" % t)
        if p.peek() == ";":
            p.next()
            continue
        if p.peek() is not None:
            raise SparqlError("trailing tokens at %r" % p.peek())
        break
    if not ops:
        raise SparqlError("empty update request")
    return ops


_TRIPLE_COLS = ("subj", "pred", "obj", "obj_datatype", "obj_lang",
                "context")


def _delete_rows(graph: DataFrame, rows: DataFrame,
                 strict_graph_scope: bool = False) -> DataFrame:
    """Remove every graph row matching a delete set on (subj, pred,
    obj) with null-safe lang/datatype.  By default a delete row with a
    NULL context removes the triple from EVERY named graph (context is
    provenance here; the reference scopes deletion by store context at
    the API level, not per statement); with ``strict_graph_scope`` it
    removes only the default-graph row (``context IS NULL``), the
    SPARQL 1.1 Update scoping.  A GRAPH-scoped delete row removes it
    from that graph only in either mode."""
    from functools import reduce

    def _anti(g, subset, ctx_cond):
        # pure equi/null-safe-equi conditions so Spark plans a HASH
        # anti-join; an OR over context would force a nested-loop
        # join — O(|graph| x |deletes|) at the 10^12-row scale the
        # update path is sized for
        r = subset.select(*[F.col(c).alias("__r_" + c)
                            for c in _TRIPLE_COLS])
        cond = [g["subj"] == r["__r_subj"],
                g["pred"] == r["__r_pred"],
                g["obj"] == r["__r_obj"],
                g["obj_datatype"].eqNullSafe(r["__r_obj_datatype"]),
                g["obj_lang"].eqNullSafe(r["__r_obj_lang"])]
        if ctx_cond == "match":
            cond.append(g["context"] == r["__r_context"])
        elif ctx_cond == "default_graph":
            cond.append(g["context"].isNull())
        return g.join(r, reduce(lambda a, b: a & b, cond),
                      "left_anti")

    out = _anti(graph, rows.where(F.col("context").isNull()),
                "default_graph" if strict_graph_scope else "any")
    return _anti(out, rows.where(F.col("context").isNotNull()),
                 "match")


def _insert_rows(graph: DataFrame, rows: DataFrame) -> DataFrame:
    """Union rows not already present (set semantics without a
    whole-graph distinct): null-safe anti-join on all six columns."""
    from functools import reduce
    g = graph.select(*[F.col(c).alias("__g_" + c)
                       for c in _TRIPLE_COLS])
    cond = [rows[c].eqNullSafe(g["__g_" + c]) for c in _TRIPLE_COLS]
    new = rows.join(g, reduce(lambda a, b: a & b, cond), "left_anti")
    return graph.unionByName(new.select(*_TRIPLE_COLS))


def sparql_update(triples: DataFrame, query: str,
                  strict_graph_scope: bool = False) -> DataFrame:
    """Execute a SPARQL UPDATE against the triples frame and return
    the updated graph (pure — callers persist via the catalog/
    snapshot layer; :func:`sparql_update_table` is the committed
    form).  Each operation's WHERE group is evaluated against the
    graph state produced by the preceding operations, per SPARQL 1.1
    Update semantics; within one operation, DELETE happens before
    INSERT over the same binding set.

    **Graph scoping of unqualified deletes — a deliberate deviation**:
    by default, a DELETE DATA / modify-form DELETE row with no GRAPH
    qualifier removes the matching triple from EVERY named graph, not
    just the default graph — the ``context`` column is provenance
    here, and the reference scopes deletion by store context at the
    API level (triplestore.py clear/remove take a context argument),
    not per statement.  Callers that need standard SPARQL 1.1 Update
    scoping (unqualified deletes touch only ``context IS NULL`` rows)
    pass ``strict_graph_scope=True``; GRAPH-qualified deletes behave
    identically in both modes."""
    spark = triples.sparkSession
    missing = [c for c in _TRIPLE_COLS if c not in triples.columns]
    if missing:
        raise SparqlError("update needs the triple schema; missing %s"
                          % missing)
    g = triples.select(*_TRIPLE_COLS)
    schema = ("subj string, pred string, obj string, "
              "obj_datatype string, obj_lang string, context string")
    for kind, payload in parse_update(query):
        if kind == "insert_data":
            # set semantics also WITHIN the block: a ground triple
            # written twice inserts once
            g = _insert_rows(g, spark.createDataFrame(payload, schema)
                             .distinct())
        elif kind == "delete_data":
            g = _delete_rows(g, spark.createDataFrame(payload, schema),
                             strict_graph_scope)
        else:
            dele, ins, group = payload
            null_s = F.lit(None).cast("string")

            def _rows(template):
                # the instantiation reads g while the anti-join below
                # also reads g — materialize the (update-batch-sized)
                # row set so it's one self-join-free frame
                return (_instantiate_template(g, template, group,
                                              with_term_meta=True)
                        .select("subj", "pred", "obj",
                                F.col("obj_datatype"),
                                F.col("obj_lang"),
                                null_s.alias("context"))
                        .localCheckpoint())

            g_after = (_delete_rows(g, _rows(dele), strict_graph_scope)
                       if dele else g)
            if ins:
                g_after = _insert_rows(g_after, _rows(ins))
            g = g_after
        # each op reads the previous op's result several times; cut
        # so chained requests don't replay the whole history per op
        g = g.localCheckpoint()
    return g


def sparql_update_table(table, spark, query: str,
                        strict_graph_scope: bool = False) -> dict:
    """Run :func:`sparql_update` against a snapshot table
    (snaptable.SnapshotTable) and commit the result as one atomic
    overwrite — the graph-store update endpoint with history: the
    prior graph state stays addressable (time travel) and a bad
    update is a ``rollback()`` away.  Data units are immutable, so
    the lazy read-modify-write is safe (the new unit is fully written
    before the commit repoints the table).  ``strict_graph_scope`` as
    in :func:`sparql_update`."""
    return table.overwrite(sparql_update(table.read(spark), query,
                                         strict_graph_scope))
