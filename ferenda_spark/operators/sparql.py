"""SPARQL-subset → DataFrame compiler (SURVEY §2.4, E2/E3).

Reference analog: every query capability of ferenda is delegated to an
external SPARQL store — ``TripleStore.select`` runs SPARQL SELECT and
returns row dicts, ``TripleStore.construct`` runs SPARQL CONSTRUCT and
returns a graph ([ref: ferenda/triplestore.py :: TripleStore.select,
construct]); the queries themselves ship as files ([ref:
ferenda/res/sparql/annotations.rq] and friends). A user of the reference
therefore *writes SPARQL*. This module keeps that surface: the same query
text compiles to a DataFrame plan over the ``triples`` tables, so Catalyst
(not Jena/Fuseki) optimizes it.

Supported subset — the shapes the reference's shipped ``.rq`` files use:

- ``PREFIX`` declarations; ``SELECT [DISTINCT] ?v … | * | (AGG(?v) AS ?a)
  | (expr AS ?a)`` (non-aggregate projection expressions follow the BIND
  model: plain literal, lexical/string-typed; under aggregation they may
  reference group keys and aggregate aliases);
  ``CONSTRUCT { template }``; ``ASK`` (→ one boolean row, LIMIT-1 probe);
  ``DESCRIBE ?v…/<iri>…`` (→ subject-rows of the described resources —
  simplification vs the spec's implementation-defined CBD: no blank-node
  recursion, the engine mints no blank nodes)
- basic graph patterns with ``.``-separated triple patterns, ``;``
  predicate-object lists and ``,`` object lists
- terms: ``?var``, ``<iri>``, ``prefixed:name``, ``"literal"``,
  ``"literal"@lang``, numeric literals, ``a`` (= rdf:type)
- property paths in predicate position: ``p1/p2`` (midpoint join), ``p1|p2``
  (bag union), ``^p`` (endpoint swap), ``p+`` (transitive closure by
  iterative doubling — O(log path-length) checkpointed self-join rounds),
  ``p*``/``p?`` (zero-or-more / zero-or-one — the zero-length leg is the
  identity over the graph's term set per the spec's ZeroOrMorePath, a
  distinct over a two-column union scan; a constant endpoint that does not
  occur in the graph yields no zero-length row, a documented departure),
  ``!p`` / ``!(p1|p2…)`` (negated property set, forward arcs only — an
  exclusion scan, inherently unprunable)
- ``GRAPH <label> { … }`` / ``GRAPH ?g { … }`` — named-graph scoping over
  the store's per-repo contexts ([ref: ferenda/triplestore.py] keeps one
  named-graph context per repo): the graph label of a triple is its source
  domain (``src_url``), a constant label is a pushed-down filter, a
  variable binds the label per pattern and equi-joins across the body's
  patterns. Body restricted to triple patterns + FILTERs; paths allowed
  under a constant graph only
- ``OPTIONAL { … }`` → left outer join on the shared variables
- ``{ … } UNION { … }`` → unionByName with null padding for
  branch-private variables (join keys must be bound in every branch)
- ``VALUES ?v { … }`` / ``VALUES (?v …) { (…) … }`` → inline broadcast
  table joined on its variables (``UNDEF`` → null, non-join columns only)
- ``{ SELECT … }`` subqueries (one standalone group element — not usable as
  a UNION branch) → the subquery's full solution pipeline compiled with its
  variables' term-kind flags retained, joined on the shared variables;
  aggregate aliases keep their native Spark type (long/double)
- ``BIND(expr AS ?v)`` → ``withColumn`` after the group's joins (documented
  simplification: triple patterns of the same group must not reference the
  bound variable; the bound term is a plain literal, lexical/string-typed)
- ``FILTER`` with ``= != < > <= >=``, arithmetic ``+ - * /`` and unary
  ``-`` (operands promoted to double), ``?v IN (…)``/``NOT IN`` (compiled
  as an ``=``-chain, so Catalyst folds it to an ``In``), ``regex(?v,
  "pat")``, ``bound(?v)``, ``isIRI/isURI/isLiteral(?v)``, ``str(?v)``,
  ``lang(?v)``, ``langMatches(lang(?v), "range")``, ``sameTerm``,
  ``contains/strstarts/strends``, ``ucase/lcase/strlen``,
  ``concat``, ``substr`` (constant positions), ``replace`` (constant
  pattern), ``strbefore/strafter`` (constant needle), ``coalesce``,
  ``IF(cond, then, else)``, ``IRI/URI(expr)`` (mints an IRI term — the
  COIN idiom ``BIND(IRI(concat(base, ?slug)) AS ?u)``),
  ``md5/sha1/sha256``, ``abs/round/floor/ceil``, ``!``, ``&&``,
  ``||``, parentheses
- ``FILTER [NOT] EXISTS { … }`` → left semi / left anti join correlated on
  the shared variables (the J6 skeleton negation shape)
- ``MINUS { … }`` → left anti join on the shared variables; with no shared
  variables it is a no-op per SPARQL's domain-overlap rule
- aggregates ``COUNT([DISTINCT] expr | *)``,
  ``SUM/AVG/MIN/MAX/SAMPLE(expr)``, ``GROUP_CONCAT(expr; SEPARATOR="…")``
  over plain variables or full expressions (``SUM(strlen(?t))``), with
  ``GROUP BY ?v …`` and ``HAVING(expr)`` — incl. inline aggregate calls
  (``HAVING(SUM(?x) > 3)``), computed as hidden columns of the same
  groupBy and dropped by the projection → ``groupBy().agg()`` (partial
  map-side aggregation for free; GROUP_CONCAT output is sorted for
  determinism — documented departure from SPARQL's unspecified order)
- ``ORDER BY [ASC|DESC](expr) …`` with bare ``?v`` / function /
  parenthesized expression sort keys (restricted to projected variables),
  ``LIMIT``, ``OFFSET``; a trailing ``VALUES`` clause joins the WHERE
  solutions (refused under aggregation)

Compilation strategy (scale notes):

- one scan per triple pattern, constant positions pushed down as filters —
  with the POS layout passed as ``pos_triples``, a constant-predicate
  pattern prunes to a single partition (SURVEY P4);
- patterns are joined most-selective-first (constant count), always
  preferring a pattern that shares a variable with the already-joined set;
  a genuinely disconnected BGP component (no shared variables anywhere)
  takes the SPARQL-mandated cartesian product via ``crossJoin`` over the
  constant-filtered scans — never over raw triples;
- a variable bound on both sides of a join is an equi-join key → plain
  shuffled/broadcast hash joins that AQE can re-plan;
- everything is column expressions — no UDFs, no driver-side iteration.

Deliberate departures from full SPARQL semantics (documented, not bugs):
unbound-variable comparisons are SQL-NULL (row dropped) rather than
type-error; numeric comparison applies when an operand side is numeric —
both sides ``try_cast`` to double, so a non-numeric binding becomes NULL
and that row drops, matching SPARQL's expression-error-eliminates-row rule
(under ANSI Spark a plain cast would abort the whole job instead); no
named graphs beyond GRAPH-as-context and no SPARQL Update (the reference's
shipped queries use neither); subqueries nest one level.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.schemas import RDF_NS

# ----------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>\s]*>)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<num>\d+(?:\.\d+)?)
    | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.-]*)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punct>&&|\|\||!=|<=|>=|[{}().;,=<>!*/|^+?-])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(f"unexpected character at {pos}: {text[pos:pos+20]!r}")
        if m.lastgroup != "ws":
            out.append(m.group())
        pos = m.end()
    return out


class SparqlSyntaxError(ValueError):
    pass


class SparqlUnsupportedError(ValueError):
    """Query is valid SPARQL but outside the supported subset."""


# ----------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Term:
    kind: str  # 'var' | 'iri' | 'lit'
    value: str
    lang: str | None = None

    @property
    def is_const(self) -> bool:
        return self.kind != "var"


@dataclass
class Pattern:
    s: Term
    p: Term
    o: Term
    graph: Term | None = None  # set inside GRAPH <g> / GRAPH ?g groups


@dataclass
class Group:
    patterns: list[Pattern] = field(default_factory=list)
    optionals: list["Group"] = field(default_factory=list)
    filters: list[tuple] = field(default_factory=list)  # filter expr ASTs
    unions: list[list["Group"]] = field(default_factory=list)  # each: branches
    values: list[tuple[list[str], list[list[Term | None]]]] = field(
        default_factory=list
    )  # (vars, rows); None = UNDEF
    exists: list[tuple[bool, "Group"]] = field(
        default_factory=list
    )  # (negated, pattern group)
    minuses: list["Group"] = field(default_factory=list)
    binds: list[tuple[str, tuple]] = field(default_factory=list)  # (var, expr)
    subqueries: list["Query"] = field(default_factory=list)


@dataclass(frozen=True)
class AggItem:
    """One ``(AGG(expr) AS ?alias)`` projection in a SELECT clause."""

    fn: str  # count | sum | avg | min | max | sample | group_concat
    var: str | None  # the variable when expr is a plain ?v; None otherwise
    alias: str
    distinct: bool = False
    separator: str = " "  # GROUP_CONCAT only
    expr: tuple | None = None  # general expression AST (None = COUNT(*))


@dataclass
class Query:
    form: str  # 'select' | 'construct' | 'ask' | 'describe'
    select_vars: list[str]  # empty = '*'
    distinct: bool
    where: Group
    template: list[Pattern]  # construct template
    order_by: list[tuple[tuple, bool]]  # (expression AST, ascending)
    limit: int | None
    offset: int | None
    aggregates: list[AggItem] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: list[tuple] = field(default_factory=list)
    select_order: list[str] = field(default_factory=list)  # projection order
    describe_targets: list[Term] = field(default_factory=list)
    select_exprs: list[tuple[str, tuple]] = field(
        default_factory=list
    )  # non-aggregate (alias, expression AST) projections


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.in_having = False  # aggregate calls are legal in HAVING only

    # -- token plumbing
    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.lower() != tok.lower():
            raise SparqlSyntaxError(f"expected {tok!r}, got {t!r}")

    def at_kw(self, kw: str) -> bool:
        t = self.peek()
        return t is not None and t.lower() == kw.lower()

    # -- entry
    def parse(self) -> Query:
        while self.at_kw("prefix"):
            self.next()
            pname = self.next()
            if not pname.endswith(":"):
                # 'pfx:' tokenizes as pname with empty local part
                raise SparqlSyntaxError(f"bad prefix name {pname!r}")
            iri = self.next()
            if not (iri.startswith("<") and iri.endswith(">")):
                raise SparqlSyntaxError(f"bad prefix IRI {iri!r}")
            self.prefixes[pname[:-1]] = iri[1:-1]
        return self.parse_query_body()

    def parse_query_body(self) -> Query:
        """One query form + WHERE + solution modifiers. Called at top level
        (stops at end of input) and for ``{ SELECT … }`` subqueries (stops at
        the enclosing ``}``)."""
        form = self.next().lower()
        aggregates: list[AggItem] = []
        select_order: list[str] = []
        describe_targets: list[Term] = []
        select_exprs: list[tuple[str, tuple]] = []
        _AGG_FNS = ("count", "sum", "avg", "min", "max", "sample", "group_concat")
        if form == "select":
            distinct = False
            if self.at_kw("distinct"):
                self.next()
                distinct = True
            sel: list[str] = []
            if self.peek() == "*":
                self.next()
            else:
                while True:
                    t = self.peek()
                    if t is not None and t.startswith("?"):
                        v = self.next()[1:]
                        sel.append(v)
                        select_order.append(v)
                    elif t == "(" and (
                        self.i + 1 < len(self.toks)
                        and self.toks[self.i + 1].lower() in _AGG_FNS
                    ):
                        agg = self.parse_agg_item()
                        aggregates.append(agg)
                        select_order.append(agg.alias)
                    elif t == "(":
                        # non-aggregate projection: (expr AS ?alias)
                        self.next()
                        e = self.parse_or()
                        self.expect("as")
                        v = self.next()
                        if not v.startswith("?"):
                            raise SparqlSyntaxError("expression needs AS ?alias")
                        self.expect(")")
                        select_exprs.append((v[1:], e))
                        select_order.append(v[1:])
                    else:
                        break
                if not select_order:
                    raise SparqlSyntaxError("SELECT needs ?vars, (AGG(...) AS ?x), or *")
            template: list[Pattern] = []
        elif form == "construct":
            distinct, sel = True, []  # CONSTRUCT output is a graph → set semantics
            if self.at_kw("where") or self.peek() != "{":
                # CONSTRUCT WHERE { … } shorthand: the WHERE's plain BGP is
                # also the template (validated after the group is parsed)
                construct_shorthand = True
                template = []
            else:
                construct_shorthand = False
                self.expect("{")
                template = self.parse_pattern_list(stop="}")
                self.expect("}")
            if any(not isinstance(p.p, Term) for p in template):
                raise SparqlSyntaxError("property paths not allowed in CONSTRUCT templates")
        elif form == "ask":
            distinct, sel, template = False, [], []
        elif form == "describe":
            distinct, sel, template = True, [], []
            while True:
                t = self.peek()
                if t is not None and t.startswith("?") and len(t) > 1:
                    describe_targets.append(Term("var", self.next()[1:]))
                elif t is not None and (t.startswith("<") or ":" in t):
                    describe_targets.append(self.parse_term())
                else:
                    break
            if not describe_targets:
                raise SparqlSyntaxError("DESCRIBE needs ?vars or IRIs")
        else:
            raise SparqlUnsupportedError(f"unsupported query form {form!r}")

        if form in ("select", "construct"):
            self.expect("where")
            where = self.parse_group()
            if form == "construct" and construct_shorthand:
                # spec grammar: the short form's WHERE is a TriplesTemplate
                # — triple patterns only
                if (
                    where.optionals or where.unions or where.values
                    or where.exists or where.minuses or where.binds
                    or where.subqueries or where.filters
                ):
                    raise SparqlUnsupportedError(
                        "CONSTRUCT WHERE shorthand requires a plain BGP"
                    )
                if any(not isinstance(p.p, Term) for p in where.patterns):
                    raise SparqlSyntaxError(
                        "property paths not allowed in CONSTRUCT templates"
                    )
                template = [Pattern(p.s, p.p, p.o) for p in where.patterns]
        elif self.at_kw("where"):  # ask/describe: WHERE keyword optional
            self.next()
            where = self.parse_group()
        elif self.peek() == "{":
            where = self.parse_group()
        else:  # DESCRIBE <iri> with no pattern
            where = Group()

        group_by: list[str] = []
        having: list[tuple] = []
        order_by: list[tuple[tuple, bool]] = []
        limit = offset = None
        while self.peek() is not None and self.peek() != "}":
            if self.at_kw("group"):
                self.next()
                self.expect("by")
                while self.peek() is not None and self.peek().startswith("?"):
                    group_by.append(self.next()[1:])
                if not group_by:
                    raise SparqlSyntaxError("GROUP BY needs ?vars")
            elif self.at_kw("having"):
                self.next()
                self.expect("(")
                self.in_having = True
                try:
                    having.append(self.parse_or())
                finally:
                    self.in_having = False
                self.expect(")")
            elif self.at_kw("order"):
                self.next()
                self.expect("by")
                while True:
                    t = self.peek()
                    if t is None or t == "}":
                        break
                    asc = True
                    if t.lower() in ("asc", "desc"):
                        asc = t.lower() == "asc"
                        self.next()
                        self.expect("(")
                        e = self.parse_or()
                        self.expect(")")
                    elif t.startswith("?") and len(t) > 1:
                        e = ("term", Term("var", self.next()[1:]))
                    elif t == "(":
                        self.next()
                        e = self.parse_or()
                        self.expect(")")
                    elif t.lower() in self._FILTER_FNS:
                        e = self.parse_primary()
                    else:
                        break
                    order_by.append((e, asc))
            elif self.at_kw("values"):
                # trailing VALUES (SPARQL 'ValuesClause'): joins the WHERE
                # solutions — same compilation as an in-group VALUES block
                self.next()
                if aggregates or group_by:
                    raise SparqlUnsupportedError(
                        "trailing VALUES with aggregation"
                    )
                where.values.append(self.parse_values())
            elif self.at_kw("limit"):
                self.next()
                limit = int(self.next())
            elif self.at_kw("offset"):
                self.next()
                offset = int(self.next())
            else:
                raise SparqlSyntaxError(f"unexpected token {self.peek()!r}")

        if form == "construct" and (aggregates or group_by or having):
            raise SparqlUnsupportedError("aggregates in CONSTRUCT not supported")
        if len(set(select_order)) != len(select_order):
            raise SparqlSyntaxError("duplicate name in SELECT projection")
        if aggregates or group_by:
            # SPARQL projection rule: non-aggregate SELECT vars must be
            # grouped; bare aggregates without GROUP BY = global aggregation
            ungrouped = [v for v in sel if v not in group_by]
            if ungrouped:
                raise SparqlSyntaxError(
                    f"SELECT vars not in GROUP BY: {ungrouped}"
                )
        elif having:
            raise SparqlSyntaxError("HAVING without aggregation")
        return Query(
            form, sel, distinct, where, template, order_by, limit, offset,
            aggregates, group_by, having, select_order, describe_targets,
            select_exprs,
        )

    def parse_agg_item(self) -> AggItem:
        self.expect("(")
        fn = self.next().lower()
        if fn not in ("count", "sum", "avg", "min", "max", "sample", "group_concat"):
            raise SparqlUnsupportedError(f"unsupported aggregate {fn!r}")
        self.expect("(")
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        var: str | None = None
        expr: tuple | None = None
        if self.peek() == "*":
            self.next()
            if fn != "count":
                raise SparqlSyntaxError(f"{fn.upper()}(*) is not SPARQL")
        else:
            expr = self.parse_or()
            if expr[0] == "term" and expr[1].kind == "var":
                var = expr[1].value
        separator = " "
        if self.peek() == ";":
            self.next()
            kw = self.next()
            if kw.lower() != "separator" or self.next() != "=":
                raise SparqlSyntaxError("expected SEPARATOR=\"…\" in GROUP_CONCAT")
            s = self.next()
            if not s.startswith('"'):
                raise SparqlSyntaxError("SEPARATOR needs a string literal")
            separator = _unescape(s[1:-1])
        self.expect(")")
        self.expect("as")
        alias = self.next()
        if not alias.startswith("?"):
            raise SparqlSyntaxError("aggregate needs AS ?alias")
        self.expect(")")
        return AggItem(fn, var, alias[1:], distinct, separator, expr)

    # -- group / patterns
    def parse_group(self) -> Group:
        self.expect("{")
        g = Group()
        while True:
            t = self.peek()
            if t is None:
                raise SparqlSyntaxError("unterminated group")
            if t == "}":
                self.next()
                return g
            if t == ".":
                self.next()
                continue
            if t.lower() == "optional":
                self.next()
                g.optionals.append(self.parse_group())
            elif t.lower() == "filter":
                self.next()
                nt = self.peek()
                if nt is not None and nt.lower() in ("exists", "not"):
                    negated = nt.lower() == "not"
                    self.next()
                    if negated:
                        self.expect("exists")
                    g.exists.append((negated, self.parse_group()))
                else:
                    self.expect("(")
                    g.filters.append(self.parse_or())
                    self.expect(")")
            elif t.lower() == "minus":
                self.next()
                g.minuses.append(self.parse_group())
            elif t.lower() == "values":
                self.next()
                g.values.append(self.parse_values())
            elif t.lower() == "graph":
                # GRAPH <label> { … } / GRAPH ?g { … } — the reference keeps
                # one named-graph context per repo ([ref: ferenda/
                # triplestore.py]); our context label is the source domain.
                # The body is restricted to a plain BGP (+ FILTERs): the
                # graph term is stamped onto each pattern and the body
                # spliced into the parent, so ?g joins across the patterns.
                self.next()
                gterm = self.parse_term()
                if gterm.kind == "lit":
                    raise SparqlSyntaxError("GRAPH needs a variable or IRI")
                sub = self.parse_group()
                if (
                    sub.optionals or sub.unions or sub.values or sub.exists
                    or sub.minuses or sub.binds or sub.subqueries
                ):
                    raise SparqlUnsupportedError(
                        "GRAPH body supports only triple patterns and FILTERs"
                    )
                for pat in sub.patterns:
                    pat.graph = gterm
                g.patterns.extend(sub.patterns)
                g.filters.extend(sub.filters)
            elif t.lower() == "bind":
                self.next()
                self.expect("(")
                expr = self.parse_or()
                self.expect("as")
                v = self.next()
                if not v.startswith("?"):
                    raise SparqlSyntaxError("BIND needs AS ?var")
                self.expect(")")
                g.binds.append((v[1:], expr))
            elif (
                t == "{"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1].lower() == "select"
            ):
                self.next()
                sub = self.parse_query_body()
                if sub.form != "select":  # pragma: no cover
                    raise SparqlUnsupportedError("only SELECT subqueries")
                self.expect("}")
                g.subqueries.append(sub)
            elif t == "{":
                branches = [self.parse_group()]
                while self.at_kw("union"):
                    self.next()
                    branches.append(self.parse_group())
                if len(branches) == 1:
                    # plain nested group — splice into the parent
                    g.patterns.extend(branches[0].patterns)
                    g.optionals.extend(branches[0].optionals)
                    g.filters.extend(branches[0].filters)
                    g.unions.extend(branches[0].unions)
                    g.values.extend(branches[0].values)
                    g.exists.extend(branches[0].exists)
                    g.minuses.extend(branches[0].minuses)
                    g.binds.extend(branches[0].binds)
                    g.subqueries.extend(branches[0].subqueries)
                else:
                    g.unions.append(branches)
            else:
                g.patterns.extend(self.parse_triples_same_subject())

    def parse_values(self) -> tuple[list[str], list[list[Term | None]]]:
        multi = self.peek() == "("
        if multi:
            self.next()
            vars_: list[str] = []
            while self.peek() is not None and self.peek().startswith("?"):
                vars_.append(self.next()[1:])
            self.expect(")")
        else:
            v = self.next()
            if not v.startswith("?"):
                raise SparqlSyntaxError("VALUES needs ?var or (?var …)")
            vars_ = [v[1:]]
        if not vars_:
            raise SparqlSyntaxError("VALUES needs at least one variable")
        self.expect("{")
        rows: list[list[Term | None]] = []
        while self.peek() is not None and self.peek() != "}":
            if multi:
                self.expect("(")
                row = [self.parse_values_term() for _ in vars_]
                self.expect(")")
            else:
                row = [self.parse_values_term()]
            rows.append(row)
        self.expect("}")
        return vars_, rows

    def parse_values_term(self) -> Term | None:
        if self.at_kw("undef"):
            self.next()
            return None
        t = self.parse_term()
        if t.kind == "var":
            raise SparqlSyntaxError("variables not allowed in VALUES data")
        return t

    def parse_pattern_list(self, stop: str) -> list[Pattern]:
        pats: list[Pattern] = []
        while self.peek() is not None and self.peek() != stop:
            if self.peek() == ".":
                self.next()
                continue
            pats.extend(self.parse_triples_same_subject())
        return pats

    def parse_triples_same_subject(self) -> list[Pattern]:
        s = self.parse_term()
        pats: list[Pattern] = []
        while True:
            p = self.parse_path()
            while True:
                o = self.parse_term()
                pats.append(Pattern(s, p, o))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() in ("}", ".", None):  # dangling ';' is legal
                    break
                continue
            break
        return pats

    # -- property paths (predicate position): alt < seq < elt
    def parse_path(self):
        left = self.parse_path_seq()
        while self.peek() == "|":
            self.next()
            left = ("alt", left, self.parse_path_seq())
        return left

    def parse_path_seq(self):
        left = self.parse_path_elt()
        while self.peek() == "/":
            self.next()
            left = ("seq", left, self.parse_path_elt())
        return left

    def parse_path_elt(self):
        inverted = False
        if self.peek() == "^":
            self.next()
            inverted = True
        if self.peek() == "!":
            # negated property set: !iri or !(iri1|iri2|…), forward arcs only
            self.next()
            if self.peek() == "(":
                self.next()
                preds = [self.parse_nps_pred()]
                while self.peek() == "|":
                    self.next()
                    preds.append(self.parse_nps_pred())
                self.expect(")")
            else:
                preds = [self.parse_nps_pred()]
            p = ("nps", tuple(t.value for t in preds))
        elif self.peek() == "(":
            self.next()
            p = self.parse_path()
            self.expect(")")
        else:
            p = self.parse_term(pred=True)
        mod = self.peek()
        if mod in ("+", "*", "?") and not (isinstance(p, Term) and p.kind == "var"):
            self.next()
            p = ({"+": "plus", "*": "star", "?": "quest"}[mod], p)
        elif mod == "+":
            raise SparqlSyntaxError("path modifier over a variable")
        if inverted:
            if isinstance(p, Term) and p.kind == "var":
                raise SparqlUnsupportedError("inverse of a variable predicate")
            p = ("inv", p)
        return p

    def parse_nps_pred(self) -> Term:
        if self.peek() == "^":
            raise SparqlUnsupportedError(
                "reverse arcs inside a negated property set"
            )
        t = self.parse_term(pred=True)
        if t.kind != "iri":
            raise SparqlSyntaxError("negated property set needs IRIs")
        return t

    def parse_term(self, pred: bool = False) -> Term:
        t = self.next()
        if t in ("+", "-"):
            # signs lex as their own tokens (they are also arithmetic
            # operators); a signed numeric literal re-joins here
            mag = self.next()
            if not re.fullmatch(r"\d+(?:\.\d+)?", mag):
                raise SparqlSyntaxError(f"bad term {t!r} {mag!r}")
            return Term("lit", ("-" + mag) if t == "-" else mag)
        if t.startswith("?") and len(t) > 1:
            return Term("var", t[1:])
        if t.startswith("<") and t.endswith(">"):
            return Term("iri", t[1:-1])
        if t == "a" and pred:
            return Term("iri", RDF_NS + "type")
        if t.startswith('"'):
            lex = _unescape(t[1:-1])
            if self.peek() is not None and self.peek().startswith("@"):
                return Term("lit", lex, self.next()[1:])
            return Term("lit", lex)
        if re.fullmatch(r"[+-]?\d+(?:\.\d+)?", t):
            return Term("lit", t)
        if ":" in t:
            pfx, local = t.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlSyntaxError(f"undeclared prefix {pfx!r}")
            return Term("iri", self.prefixes[pfx] + local)
        raise SparqlSyntaxError(f"bad term {t!r}")

    # -- filter expressions (precedence: || < && < ! < cmp)
    def parse_or(self):
        left = self.parse_and()
        while self.peek() == "||":
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek() == "&&":
            self.next()
            left = ("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.peek() == "!":
            self.next()
            return ("not", self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self):
        left = self.parse_add()
        t = self.peek()
        if t in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return ("cmp", t, left, self.parse_add())
        if t is not None and t.lower() == "in":
            self.next()
            return ("in", False, left, self.parse_in_list())
        if t is not None and t.lower() == "not":
            self.next()
            self.expect("in")
            return ("in", True, left, self.parse_in_list())
        return left

    def parse_in_list(self) -> list[Term]:
        self.expect("(")
        terms: list[Term] = []
        if self.peek() != ")":
            terms.append(self.parse_term())
            while self.peek() == ",":
                self.next()
                terms.append(self.parse_term())
        self.expect(")")
        return terms

    # arithmetic: + - below * /; unary - on primaries
    def parse_add(self):
        left = self.parse_mul()
        while self.peek() in ("+", "-"):
            op = self.next()
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek() in ("*", "/"):
            op = self.next()
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.peek() == "-":
            self.next()
            return ("neg", self.parse_unary())
        if self.peek() == "+":
            self.next()
            return self.parse_unary()
        return self.parse_primary()

    _FILTER_FNS = (
        "regex", "bound", "isiri", "isuri", "isliteral", "str", "lang",
        "contains", "strstarts", "strends", "ucase", "lcase", "strlen",
        "concat", "substr", "replace", "coalesce", "if",
        "strbefore", "strafter", "langmatches", "sameterm",
        "iri", "uri", "md5", "sha1", "sha256",
        "abs", "round", "floor", "ceil",
    )

    _AGG_FN_NAMES = (
        "count", "sum", "avg", "min", "max", "sample", "group_concat",
    )

    def parse_primary(self):
        t = self.peek()
        if t == "(":
            self.next()
            e = self.parse_or()
            self.expect(")")
            return e
        if (
            t is not None
            and self.in_having
            and t.lower() in self._AGG_FN_NAMES
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == "("
        ):
            # inline aggregate in HAVING: AGG([DISTINCT] expr | *)
            fn = self.next().lower()
            self.expect("(")
            distinct = False
            if self.at_kw("distinct"):
                self.next()
                distinct = True
            if self.peek() == "*":
                self.next()
                if fn != "count":
                    raise SparqlSyntaxError(f"{fn.upper()}(*) is not SPARQL")
                e = None
            else:
                e = self.parse_or()
            self.expect(")")
            return ("hagg", fn, distinct, e)
        if t is not None and t.lower() in self._FILTER_FNS:
            fn = self.next().lower()
            self.expect("(")
            args = [self.parse_or()]
            while self.peek() == ",":
                self.next()
                args.append(self.parse_or())
            self.expect(")")
            return (fn, *args)
        term = self.parse_term()
        return ("term", term)


def _unescape(s: str) -> str:
    return (
        s.replace('\\"', '"').replace("\\\\", "\\").replace("\\n", "\n").replace("\\t", "\t")
    )


def parse_sparql(query: str) -> Query:
    """Parse a query string of the supported subset into the AST."""
    p = _Parser(_tokenize(query))
    q = p.parse()
    if p.peek() is not None:
        raise SparqlSyntaxError(f"trailing tokens at {p.peek()!r}")
    return q


# ----------------------------------------------------------------- compiler


def _pat_vars(pat: Pattern) -> set[str]:
    ts = [pat.s, pat.o] + ([pat.p] if isinstance(pat.p, Term) else [])
    if pat.graph is not None:
        ts.append(pat.graph)
    return {t.value for t in ts if t.kind == "var"}


def _pat_const_count(pat: Pattern) -> int:
    ts = [pat.s, pat.o] + ([pat.p] if isinstance(pat.p, Term) else [])
    n = sum(t.is_const for t in ts)
    if not isinstance(pat.p, Term):
        n += 1  # a path predicate is itself a constant filter on the edges
    if pat.graph is not None and pat.graph.is_const:
        n += 1
    return n


def _graph_label_col(src: DataFrame) -> F.Column:
    """The named-graph label of a triple row — the source domain, matching
    SparkTripleStore's per-repo context convention."""
    if "src_url" not in src.columns:
        raise SparqlUnsupportedError(
            "GRAPH requires triples with provenance (src_url column)"
        )
    return F.lower(F.regexp_extract(F.col("src_url"), r"^[a-z][a-z0-9+.\-]*://([^/]+)", 1))


_CLOSURE_MAX_DOUBLINGS = 40  # paths up to length 2**40 — a loop backstop


def _path_closure(edges: DataFrame) -> DataFrame:
    """Transitive closure of an (a, a_uri, b, b_uri) edge frame by iterative
    doubling: each round joins the reach set with itself, so path length
    covered doubles — O(log longest-path) rounds, each a self-join +
    distinct, localCheckpoint-truncated like connected components. The
    closure's size is a property of the queried graph (bounded by component
    sizes), not of the algorithm."""
    from ferenda_spark.checkpoint import RoundCadence as _RoundCadence

    cad = _RoundCadence()
    reach = cad.seed(edges.distinct())
    n = reach.count()
    for _ in range(_CLOSURE_MAX_DOUBLINGS):
        left = reach.select(
            F.col("a"), F.col("a_uri"), F.col("b").alias("_mid")
        )
        right = reach.select(
            F.col("a").alias("_mid"), F.col("b"), F.col("b_uri")
        )
        stepped = left.join(right, "_mid").select("a", "a_uri", "b", "b_uri")
        # the convergence count materializes the (lazily cached) round;
        # eager checkpoints only every cadence round (RoundCadence)
        new = cad.step(reach.unionByName(stepped).distinct())
        m = new.count()
        if m == n:
            # converged: new == reach as a set — return the LIVE frame
            return cad.finish(new)
        reach, n = new, m
    cad.close()
    raise RuntimeError("path closure did not converge (cycle bookkeeping bug?)")


def _path_edges(
    triples: DataFrame, pos_triples: DataFrame | None, path
) -> DataFrame:
    """Path expression → (a, a_uri, b, b_uri) edge frame. Leaf predicates
    scan the POS layout when available (partition-pruned); seq is a join on
    the midpoint, alt a bag union, inv an endpoint swap, plus a transitive
    closure."""
    if isinstance(path, Term):
        if path.kind == "var":
            raise SparqlUnsupportedError("variable predicate inside a path")
        src = pos_triples if pos_triples is not None else triples
        return src.filter(F.col("pred") == F.lit(path.value)).select(
            F.col("subj").alias("a"),
            F.lit(True).alias("a_uri"),
            F.col("obj").alias("b"),
            F.col("obj_is_uri").alias("b_uri"),
        )
    kind = path[0]
    if kind == "inv":
        e = _path_edges(triples, pos_triples, path[1])
        return e.select(
            F.col("b").alias("a"),
            F.col("b_uri").alias("a_uri"),
            F.col("a").alias("b"),
            F.col("a_uri").alias("b_uri"),
        )
    if kind == "alt":
        return _path_edges(triples, pos_triples, path[1]).unionByName(
            _path_edges(triples, pos_triples, path[2])
        )
    if kind == "seq":
        e1 = _path_edges(triples, pos_triples, path[1]).select(
            "a", "a_uri", F.col("b").alias("_mid")
        )
        e2 = _path_edges(triples, pos_triples, path[2]).select(
            F.col("a").alias("_mid"), "b", "b_uri"
        )
        return e1.join(e2, "_mid").select("a", "a_uri", "b", "b_uri")
    if kind == "plus":
        return _path_closure(_path_edges(triples, pos_triples, path[1]))
    if kind == "nps":
        # negated property set: exclusion over predicates — inherently a
        # full scan (no POS pruning possible; the excluded set is small,
        # the kept set is everything else)
        return triples.filter(~F.col("pred").isin(*path[1])).select(
            F.col("subj").alias("a"),
            F.lit(True).alias("a_uri"),
            F.col("obj").alias("b"),
            F.col("obj_is_uri").alias("b_uri"),
        )
    if kind == "quest":
        # zero-or-one: the zero-length path relates every graph term to
        # itself (SPARQL 18.4 ZeroOrOnePath over the queried graph)
        e = _path_edges(triples, pos_triples, path[1])
        return _graph_identity(triples).unionByName(e).distinct()
    if kind == "star":
        # zero-or-more = identity over graph terms ∪ one-or-more closure.
        # The identity leg costs a distinct over the graph's term set — that
        # is what the spec's zero-length semantics means; constant endpoints
        # still prune (Catalyst pushes the endpoint filter into both union
        # legs, under the distinct).
        plus = _path_closure(_path_edges(triples, pos_triples, path[1]))
        return _graph_identity(triples).unionByName(plus).distinct()
    raise SparqlUnsupportedError(f"unsupported path {kind!r}")


def _graph_identity(triples: DataFrame) -> DataFrame:
    """(t, t) for every RDF term t occurring in the graph — the zero-length
    path relation of SPARQL's ZeroOrMorePath/ZeroOrOnePath."""
    terms = (
        triples.select(F.col("subj").alias("a"), F.lit(True).alias("a_uri"))
        .unionByName(
            triples.select(
                F.col("obj").alias("a"), F.col("obj_is_uri").alias("a_uri")
            )
        )
        .distinct()
    )
    return terms.select(
        "a", "a_uri", F.col("a").alias("b"), F.col("a_uri").alias("b_uri")
    )


def _path_scan(
    triples: DataFrame, pos_triples: DataFrame | None, pat: Pattern
) -> tuple[DataFrame, set[str]]:
    """Pattern with a path predicate → scan over the path's edge frame,
    mirroring _scan's contract (var columns + __uri/__lang flags)."""
    if pat.graph is not None:
        if pat.graph.kind == "var":
            raise SparqlUnsupportedError(
                "GRAPH ?var over a property path (per-graph path evaluation)"
            )
        # a path inside GRAPH <g> evaluates entirely within that graph —
        # restrict the edge source before building the path relation
        triples = triples.filter(
            _graph_label_col(triples) == F.lit(pat.graph.value)
        )
        pos_triples = (
            pos_triples.filter(
                _graph_label_col(pos_triples) == F.lit(pat.graph.value)
            )
            if pos_triples is not None and "src_url" in pos_triples.columns
            else None
        )
    e = _path_edges(triples, pos_triples, pat.p)
    cond = F.lit(True)
    cols: dict[str, F.Column] = {}
    uri_flags: dict[str, F.Column] = {}
    for term, val_col, uri_col in (
        (pat.s, F.col("a"), F.col("a_uri")),
        (pat.o, F.col("b"), F.col("b_uri")),
    ):
        if term.is_const:
            cond = cond & (val_col == F.lit(term.value)) & (
                uri_col == F.lit(term.kind == "iri")
            )
        elif term.value in cols:  # ?x path ?x → endpoint equality
            cond = cond & (val_col == cols[term.value])
        else:
            cols[term.value] = val_col
            uri_flags[term.value] = uri_col
    out = e.filter(cond).select(
        *[c.alias(v) for v, c in cols.items()],
        *[uri_flags[v].alias(f"{v}__uri") for v in cols],
        *[F.lit(None).cast("string").alias(f"{v}__lang") for v in cols],
    )
    return out, set(cols)


def _scan(
    triples: DataFrame, pos_triples: DataFrame | None, pat: Pattern
) -> tuple[DataFrame, set[str]]:
    if not isinstance(pat.p, Term):
        return _path_scan(triples, pos_triples, pat)
    """One triple pattern → a filtered scan projected to its variables.

    Variable columns carry the raw lexical value; ``<var>__uri`` carries the
    obj_is_uri flag when the variable binds an object position (subjects and
    predicates are URIs by construction) and ``<var>__lang`` the literal's
    language tag (null off the object position). A constant predicate routes
    the scan to the POS layout when provided (partition pruning, SURVEY P4)."""
    src = pos_triples if (pos_triples is not None and pat.p.is_const) else triples
    if pat.graph is not None and "src_url" not in src.columns:
        src = triples  # fall back to the provenance-carrying layout
    has_lang = "obj_lang" in src.columns
    cond = F.lit(True)
    cols: dict[str, F.Column] = {}
    uri_flags: dict[str, F.Column] = {}
    lang_flags: dict[str, F.Column] = {}

    for pos, term, col, is_uri_col in (
        ("s", pat.s, "subj", F.lit(True)),
        ("p", pat.p, "pred", F.lit(True)),
        ("o", pat.o, "obj", F.col("obj_is_uri")),
    ):
        if term.is_const:
            c = F.col(col) == F.lit(term.value)
            if pos == "o":
                # a constant IRI object must match URI rows; a literal must not
                c = c & (F.col("obj_is_uri") == F.lit(term.kind == "iri"))
                if term.lang is not None and has_lang:
                    c = c & (F.col("obj_lang") == F.lit(term.lang))
            cond = cond & c
        else:
            v = term.value
            if v in cols:  # same var twice in one pattern → equality
                cond = cond & (F.col(col) == cols[v])
            else:
                cols[v] = F.col(col)
                uri_flags[v] = is_uri_col
                lang_flags[v] = (
                    F.col("obj_lang")
                    if (pos == "o" and has_lang)
                    else F.lit(None).cast("string")
                )
    if pat.graph is not None:
        label = _graph_label_col(src)
        if pat.graph.is_const:
            cond = cond & (label == F.lit(pat.graph.value))
        elif pat.graph.value in cols:  # GRAPH ?g { … ?g … } → equality
            cond = cond & (label == cols[pat.graph.value])
        else:
            v = pat.graph.value
            cols[v] = label
            uri_flags[v] = F.lit(True)  # a graph name names a graph
            lang_flags[v] = F.lit(None).cast("string")
    out = src.filter(cond).select(
        *[c.alias(v) for v, c in cols.items()],
        *[uri_flags[v].alias(f"{v}__uri") for v in cols],
        *[lang_flags[v].alias(f"{v}__lang") for v in cols],
    )
    return out, set(cols)


#: legs double per maybe-null var; 4 → 16 equi-joins, beyond which the
#: plan (and the query) has outgrown this rewrite — refuse loudly instead
_MAX_MAYBE_NULL = 4


def _null_tolerant_correlate(
    df: DataFrame,
    sdf: DataFrame,
    on: list[str],
    maybe: list[str],
    how: str,
    minus: bool = False,
    sub_maybe: list[str] | None = None,
) -> DataFrame:
    """Correlated semi/anti join under SPARQL's unbound-is-compatible rule
    when join variables may be SQL NULL on EITHER side
    (OPTIONAL/UNION-introduced): an unbound variable imposes no constraint
    — it is compatible with anything — so instead of one non-equi
    condition (``a = b OR a IS NULL OR b IS NULL`` forces a nested-loop
    join) both sides split by null-mask into equi-join legs
    (2^|maybe| outer × 2^|sub_maybe| sub, |maybe|+|sub_maybe| ≤
    _MAX_MAYBE_NULL):

    - each OUTER leg filters the outer side to one exact null-mask; the
      vars non-null under that mask are the candidate keys — outer-null
      vars constrain nothing (free on the outer side);
    - within an outer leg, the SUB side splits by its null-mask over
      ``sub_maybe`` ∩ keys: a sub leg joins only on the vars non-null on
      BOTH sides. Legs compose progressively (matched rows peel off via
      anti-join before the next leg probes), so no outer row is ever
      double-counted;
    - a leg with NO join keys left: for EXISTS the test degenerates to
      leg non-emptiness — probed with a broadcast limit(1), never a
      full-pattern materialization; for MINUS (``minus=True``) the
      variable domains are disjoint, so the spec KEEPS the row
      unconditionally (both when the OUTER row binds no shared var and
      when the SUB solution binds none — dom(μ1) ∩ dom(μ2) = ∅).

    Semantics note (documented choice): with sub-side maybe-nulls this
    implements COMPATIBILITY semantics — the outer row passes EXISTS iff
    some sub solution is compatible with it. For UNION-introduced
    sub-nulls this coincides with SPARQL 1.1's substitution rule (a
    branch not mentioning the var yields solutions that constrain it
    nowhere); for OPTIONAL-introduced sub-nulls substitution-vs-
    compatibility is the divergence the W3C SPARQL-EXISTS CG documents
    across engines — this engine picks compatibility, the same rule
    MINUS is specified with, and the property suite's naive evaluator
    replays exactly that. MINUS itself is spec'd as compatibility +
    domain-overlap, which the keys-empty rule above reproduces.

    All legs are hash joins over the same child plans, so the split costs
    a few extra scans of the (already small) correlated pattern, not a
    shuffle of the outer side."""
    sub_maybe = list(sub_maybe or [])
    if len(maybe) + len(sub_maybe) > _MAX_MAYBE_NULL:
        raise SparqlUnsupportedError(
            f"correlation through more than {_MAX_MAYBE_NULL} maybe-unbound "
            f"variables: {sorted(set(maybe) | set(sub_maybe))}"
        )
    sure = [v for v in on if v not in maybe]
    legs: list[DataFrame] = []
    for mask in range(1 << len(maybe)):
        null_vars = [v for i, v in enumerate(maybe) if mask >> i & 1]
        keys = sure + [v for v in maybe if v not in null_vars]
        rows = df
        for v in null_vars:
            rows = rows.filter(F.col(v).isNull())
        for v in keys:
            if v in maybe:
                rows = rows.filter(F.col(v).isNotNull())
        if not keys:
            if minus:
                # MINUS with every shared var unbound on this row: disjoint
                # variable domains — the solution is never removed
                legs.append(rows)
            else:
                probe = F.broadcast(
                    sdf.limit(1).select(F.lit(1).alias("__probe")))
                legs.append(rows.join(probe, F.lit(True), how=how))
            continue
        smaybe = [v for v in sub_maybe if v in keys]
        if not smaybe:
            legs.append(rows.join(sdf.select(*keys), on=keys, how=how))
            continue
        # sub-side split: progressive legs — matched rows peel off, the
        # remainder probes the next sub null-mask; masks partition the sub
        # rows, so each side of the correlation is counted exactly once.
        remaining = rows
        matched: list[DataFrame] = []
        for smask in range(1 << len(smaybe)):
            snull = [v for i, v in enumerate(smaybe) if smask >> i & 1]
            skeys = [v for v in keys if v not in snull]
            sleg = sdf
            for v in snull:
                sleg = sleg.filter(F.col(v).isNull())
            for v in smaybe:
                if v not in snull:
                    sleg = sleg.filter(F.col(v).isNotNull())
            if skeys:
                if how == "left_semi":
                    matched.append(
                        remaining.join(sleg.select(*skeys), skeys,
                                       "left_semi"))
                remaining = remaining.join(
                    sleg.select(*skeys), skeys, "left_anti")
            elif not minus:
                # sub solution binding NO outer-bound shared var:
                # compatible with every outer row — non-emptiness probe.
                # (MINUS: dom overlap is empty → never removes → skip.)
                probe = F.broadcast(
                    sleg.limit(1).select(F.lit(1).alias("__probe")))
                if how == "left_semi":
                    matched.append(
                        remaining.join(probe, F.lit(True), "left_semi"))
                remaining = remaining.join(probe, F.lit(True), "left_anti")
        # semi (EXISTS): rows matched by ANY leg; anti (NOT EXISTS /
        # MINUS): rows matched by NO leg — the progressive remainder.
        legs.extend(matched if how == "left_semi" else [remaining])
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _join_group(
    triples: DataFrame, pos_triples: DataFrame | None, group: Group
) -> tuple[DataFrame, set[str], set[str]]:
    """Compile a group to (df, bound_vars, maybe_null_vars).

    ``maybe_null_vars`` ⊆ bound_vars: variables a row can carry as SQL NULL
    (introduced by OPTIONAL, or private to some UNION branch). SPARQL's
    unbound-is-compatible join rule cannot be expressed as ONE equi-join on
    such a variable — EXISTS/MINUS split BOTH sides by null-mask into
    equi-join legs (_null_tolerant_correlate; outer maybe-nulls and
    sub-pattern maybe-nulls together capped at _MAX_MAYBE_NULL); every
    other join site raises SparqlUnsupportedError rather than silently
    dropping/keeping rows the spec wouldn't."""
    if not (
        group.patterns
        or group.optionals
        or group.unions
        or group.values
        or group.subqueries
    ):
        raise SparqlUnsupportedError("empty group pattern")

    # order: most constants first (selectivity), then greedily pick patterns
    # sharing a variable with the joined set — avoids cross products.
    remaining = sorted(group.patterns, key=lambda p: -_pat_const_count(p))
    df: DataFrame | None = None
    bound: set[str] = set()
    nullable: set[str] = set()
    while remaining:
        nxt_i = 0
        if df is not None:
            for i, pat in enumerate(remaining):
                pvars = _pat_vars(pat)
                if pvars & bound:
                    nxt_i = i
                    break
            # no pattern shares a variable → disconnected component; fall
            # through with the most-selective remaining pattern (nxt_i=0)
            # and let the crossJoin below take the cartesian product.
        pat = remaining.pop(nxt_i)
        scan, pvars = _scan(triples, pos_triples, pat)
        if df is None:
            df, bound = scan, pvars
        else:
            on = sorted(pvars & bound)
            # keep the left side's term-kind flag for join vars (the join is
            # on lexical value; both sides' flags agree except in the exotic
            # literal-vs-URI-same-lexical case, which the corpus vocabulary
            # precludes — URIs and literals live in disjoint namespaces)
            for v in on:
                scan = scan.drop(f"{v}__uri", f"{v}__lang")
            if on:
                df = df.join(scan, on=on, how="inner")
            else:
                # disconnected BGP components: SPARQL semantics is the
                # cartesian product of their solution sets. Both sides are
                # constant-filtered scans (most-selective-first order), so
                # the product is over already-reduced solution sets, not raw
                # triples; Catalyst plans it as a broadcast nested loop.
                df = df.crossJoin(scan)
            bound |= pvars

    for sq in group.subqueries:
        sdf, svars, snull = _solutions(triples, pos_triples, sq)
        sq_bind_overlap = set(svars) & {v for v, _e in group.binds}
        if sq_bind_overlap:
            raise SparqlUnsupportedError(
                "subquery sharing a BIND variable of the same group: "
                f"{sorted(sq_bind_overlap)}"
            )
        if df is None:
            df, bound, nullable = sdf, set(svars), set(snull)
            continue
        on = sorted(set(svars) & bound)
        if set(on) & (nullable | snull):
            raise SparqlUnsupportedError(
                "subquery joined on a variable that may be unbound: "
                f"{sorted(set(on) & (nullable | snull))}"
            )
        for v in on:
            sdf = sdf.drop(f"{v}__uri", f"{v}__lang")
        df = df.join(sdf, on=on, how="inner") if on else df.crossJoin(sdf)
        bound |= set(svars)
        nullable |= snull - set(on)

    for branches in group.unions:
        bdfs = [_join_group(triples, pos_triples, b) for b in branches]
        uvars: set[str] = set().union(*(v for _, v, _n in bdfs))
        # certain = definitely non-null in EVERY branch (bound there and
        # not maybe-null inside the branch)
        certain: set[str] = set.intersection(*(v - n for _, v, n in bdfs))
        # branch-private variables pad with nulls (SPARQL: unbound)
        udf = bdfs[0][0]
        for extra, _v, _n in bdfs[1:]:
            udf = udf.unionByName(extra, allowMissingColumns=True)
        if df is None:
            df, bound = udf, uvars
        else:
            on = sorted(uvars & bound)
            if not set(on) <= certain:
                raise SparqlUnsupportedError(
                    "UNION join variable must be bound in every branch "
                    f"(got {sorted(set(on) - certain)})"
                )
            if set(on) & nullable:
                raise SparqlUnsupportedError(
                    "UNION joined on a variable that may be unbound in the "
                    f"outer group: {sorted(set(on) & nullable)}"
                )
            for v in on:
                udf = udf.drop(f"{v}__uri", f"{v}__lang")
            df = df.join(udf, on=on, how="inner") if on else df.crossJoin(udf)
            bound |= uvars
        nullable |= uvars - certain

    for vars_, rows in group.values:
        vdf = _values_frame(triples.sparkSession, vars_, rows)
        if df is None:
            df, bound = vdf, set(vars_)
            nullable |= {
                v for v in vars_ if any(r[vars_.index(v)] is None for r in rows)
            }
            continue
        on = sorted(set(vars_) & bound)
        if set(on) & nullable:
            raise SparqlUnsupportedError(
                "VALUES joined on a variable that may be unbound in the "
                f"outer group: {sorted(set(on) & nullable)}"
            )
        if on and any(r[vars_.index(v)] is None for r in rows for v in on):
            raise SparqlUnsupportedError(
                "UNDEF in a VALUES join column not supported"
            )
        nullable |= {
            v
            for v in set(vars_) - bound
            if any(r[vars_.index(v)] is None for r in rows)
        }
        for v in on:
            vdf = vdf.drop(f"{v}__uri", f"{v}__lang")
        # inline data is tiny by construction → broadcast hash join
        df = (
            df.join(F.broadcast(vdf), on=on, how="inner")
            if on
            else df.crossJoin(F.broadcast(vdf))
        )
        bound |= set(vars_)

    for opt in group.optionals:
        if opt.optionals:
            raise SparqlUnsupportedError("nested OPTIONAL not supported")
        odf, ovars, onull = _join_group(triples, pos_triples, opt)
        if df is None:
            df, bound, nullable = odf, ovars, set(onull)
            continue
        on = sorted(ovars & bound)
        if not on:
            raise SparqlUnsupportedError("OPTIONAL sharing no variables not supported")
        if set(on) & (nullable | onull):
            raise SparqlUnsupportedError(
                "OPTIONAL joined on a variable that may be unbound: "
                f"{sorted(set(on) & (nullable | onull))}"
            )
        for v in on:
            odf = odf.drop(f"{v}__uri", f"{v}__lang")
        df = df.join(odf, on=on, how="left")
        # every variable the OPTIONAL introduces can be null on non-match
        nullable |= ovars - bound
        bound |= ovars

    assert df is not None
    # BINDs apply after the joins below; a bind variable referenced inside
    # EXISTS/MINUS would silently lose its correlation (treated as a free
    # variable) — refuse the shape instead of returning wrong rows
    bind_names = {v for v, _e in group.binds}
    for negated, sub in group.exists:
        sdf, svars, snull = _join_group(triples, pos_triples, sub)
        if svars & bind_names:
            raise SparqlUnsupportedError(
                "EXISTS referencing a BIND variable of the same group: "
                f"{sorted(svars & bind_names)}"
            )
        on = sorted(svars & bound)
        if not on:
            raise SparqlUnsupportedError(
                "EXISTS sharing no variables not supported"
            )
        maybe = sorted(set(on) & nullable)
        sub_maybe = sorted(set(on) & snull)
        how = "left_anti" if negated else "left_semi"
        if not maybe and not sub_maybe:
            # correlated on the shared variables → semi/anti join (the J6
            # skeleton shape). Equivalent to SPARQL's binding substitution.
            df = df.join(sdf.select(*on), on=on, how=how)
        else:
            # unbound-is-compatible on either side: an unbound outer var
            # is FREE in the pattern; a sub solution leaving a var unbound
            # constrains it nowhere (compatibility semantics — see
            # _null_tolerant_correlate's docstring for the
            # substitution-vs-compatibility note on sub-side OPTIONALs)
            df = _null_tolerant_correlate(
                df, sdf, on, maybe, how, sub_maybe=sub_maybe)
    for sub in group.minuses:
        sdf, svars, snull = _join_group(triples, pos_triples, sub)
        if svars & bind_names:
            raise SparqlUnsupportedError(
                "MINUS referencing a BIND variable of the same group: "
                f"{sorted(svars & bind_names)}"
            )
        on = sorted(svars & bound)
        if not on:
            # SPARQL MINUS semantics: solutions with disjoint variable
            # domains are never removed — a shared-variable-free MINUS is
            # a no-op (unlike EXISTS, which would be a constant test)
            continue
        maybe = sorted(set(on) & nullable)
        sub_maybe = sorted(set(on) & snull)
        if len(on) > 1 and (maybe or sub_maybe):
            # compatibility + domain overlap with maybe-unbound vars on
            # EITHER side: rows binding a var must agree on it to be
            # removed; a var unbound on either side is compatible
            # regardless (trivially); the row survives when the shared
            # bound-on-both-sides set is empty (disjoint domains) — the
            # two-sided null-mask legs express exactly that. (With ONE
            # shared var, null-never-matches already coincides with the
            # domain-overlap rule on BOTH sides: an unbound side →
            # disjoint domains → row kept.)
            df = _null_tolerant_correlate(
                df, sdf, on, maybe, "left_anti", minus=True,
                sub_maybe=sub_maybe,
            )
        else:
            df = df.join(sdf.select(*on), on=on, how="left_anti")
    for v, expr in group.binds:
        # BIND is applied after the group's joins (documented simplification:
        # triple patterns in the same group must not reference the bound
        # variable). The value column keeps the engine's all-lexical model —
        # the expression result is cast to string; the term is a plain
        # literal (__uri false, no language tag).
        if v in bound:
            raise SparqlSyntaxError(f"BIND would rebind ?{v}")
        col, _ = _value(expr, bound)
        df = (
            df.withColumn(v, col.cast("string"))
            .withColumn(f"{v}__uri", F.lit(_expr_is_iri(expr)))
            .withColumn(f"{v}__lang", F.lit(None).cast("string"))
        )
        bound.add(v)
        nullable.add(v)  # the expression may evaluate to NULL (unbound)
    for fexpr in group.filters:
        df = df.filter(_compile_filter(fexpr, bound))
    return df, bound, nullable


def _values_frame(spark, vars_: list[str], rows) -> DataFrame:
    """VALUES block → an inline DataFrame with the same per-variable column
    triplet (value, __uri, __lang) the pattern scans produce."""
    data = []
    for row in rows:
        rec: list = []
        for t in row:
            if t is None:  # UNDEF
                rec += [None, None, None]
            else:
                rec += [t.value, t.kind == "iri", t.lang]
        data.append(tuple(rec))
    schema = ", ".join(
        f"`{v}` string, `{v}__uri` boolean, `{v}__lang` string" for v in vars_
    )
    return spark.createDataFrame(data, schema)


def _compile_filter(ast, bound: set[str]) -> F.Column:
    kind = ast[0]
    if kind == "or":
        return _compile_filter(ast[1], bound) | _compile_filter(ast[2], bound)
    if kind == "and":
        return _compile_filter(ast[1], bound) & _compile_filter(ast[2], bound)
    if kind == "not":
        return ~_compile_filter(ast[1], bound)
    if kind == "cmp":
        _, op, lt, rt = ast
        lc, lnum = _value(lt, bound)
        rc, rnum = _value(rt, bound)
        if lnum or rnum:  # numeric comparison per SPARQL operand typing
            lc, rc = lc.try_cast("double"), rc.try_cast("double")
        return {
            "=": lc == rc, "!=": lc != rc, "<": lc < rc,
            ">": lc > rc, "<=": lc <= rc, ">=": lc >= rc,
        }[op]
    if kind == "regex":
        col, _ = _value(ast[1], bound)
        pat = _const_str(ast[2])
        flags = _const_str(ast[3]) if len(ast) > 3 else ""
        return col.rlike(("(?i)" if "i" in flags else "") + pat)
    if kind == "bound":
        col, _ = _value(ast[1], bound)
        return col.isNotNull()
    if kind in ("isiri", "isuri", "isliteral"):
        t = ast[1]
        if t[0] != "term" or t[1].kind != "var":
            raise SparqlUnsupportedError(f"{kind} over non-variable")
        flag = F.col(f"{t[1].value}__uri")
        return ~flag if kind == "isliteral" else flag
    if kind == "in":
        # ?x IN (a, b, …) ≡ ?x = a || ?x = b || … (SPARQL 17.4.1.9) —
        # compiled exactly so, reusing =’s numeric-operand typing; Catalyst
        # folds same-typed chains into an In. NOT IN over an unbound (NULL)
        # operand drops the row (the module-wide unbound-is-NULL departure).
        _, negated, expr, terms = ast
        c = F.lit(False)
        for t in terms:
            c = c | _compile_filter(("cmp", "=", expr, ("term", t)), bound)
        return ~c if negated else c
    if kind in ("contains", "strstarts", "strends"):
        col, _ = _value(ast[1], bound)
        arg, _ = _value(ast[2], bound)
        return {
            "contains": col.contains(arg),
            "strstarts": col.startswith(arg),
            "strends": col.endswith(arg),
        }[kind]
    if kind == "langmatches":
        # langMatches(lang(?t), "range"): '*' = any non-empty tag; otherwise
        # case-insensitive basic range match (exact or subtag prefix)
        tag, _ = _value(ast[1], bound)
        rng = _const_str(ast[2])
        if rng == "*":
            return tag != F.lit("")
        low = F.lower(tag)
        return (low == F.lit(rng.lower())) | low.startswith(rng.lower() + "-")
    if kind == "sameterm":
        # term identity: lexical value AND term kind AND language tag
        def parts(a):
            if a[0] == "term" and a[1].kind == "var":
                v = a[1].value
                if v not in bound:
                    return (
                        F.lit(None).cast("string"),
                        F.lit(None).cast("boolean"),
                        F.lit(None).cast("string"),
                    )
                return F.col(v), F.col(f"{v}__uri"), F.col(f"{v}__lang")
            if a[0] == "term":
                t = a[1]
                return (
                    F.lit(t.value),
                    F.lit(t.kind == "iri"),
                    F.lit(t.lang).cast("string"),
                )
            raise SparqlUnsupportedError("sameTerm over expressions")

        lv, lu, ll = parts(ast[1])
        rv, ru, rl = parts(ast[2])
        return (lv == rv) & (lu == ru) & ll.eqNullSafe(rl)
    if kind == "str":
        return _value(ast, bound)[0]
    raise SparqlUnsupportedError(f"unsupported filter {kind!r}")


def _value(ast, bound: set[str]) -> tuple[F.Column, bool]:
    """expr → (column, is_numeric). ``is_numeric`` drives =/< operand
    typing: a numeric side makes the comparison numeric (both sides cast to
    double), mirroring SPARQL's operand-type promotion over our all-lexical
    columns."""
    kind = ast[0]
    if kind == "str":
        return _value(ast[1], bound)[0], False
    if kind == "arith":
        _, op, lt, rt = ast
        lc = _value(lt, bound)[0].try_cast("double")
        rc = _value(rt, bound)[0].try_cast("double")
        return {
            "+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc,
        }[op], True
    if kind == "neg":
        return -_value(ast[1], bound)[0].try_cast("double"), True
    if kind in ("ucase", "lcase"):
        c, _ = _value(ast[1], bound)
        return (F.upper if kind == "ucase" else F.lower)(c), False
    if kind == "strlen":
        return F.length(_value(ast[1], bound)[0]), True
    if kind == "concat":
        return F.concat(*[_value(a, bound)[0] for a in ast[1:]]), False
    if kind == "substr":
        # SPARQL SUBSTR(source, start[, length]) — 1-based like Spark
        c, _ = _value(ast[1], bound)
        start = int(float(_const_num(ast[2])))
        if len(ast) > 3:
            return F.substring(c, start, int(float(_const_num(ast[3])))), False
        return F.substring(c, start, 2**31 - 1), False
    if kind == "replace":
        c, _ = _value(ast[1], bound)
        return F.regexp_replace(c, _const_str(ast[2]), _const_str(ast[3])), False
    if kind in ("strbefore", "strafter"):
        # constant needle (like substr/replace); SPARQL: "" when absent
        c, _ = _value(ast[1], bound)
        sub = _const_str(ast[2])
        pos = F.instr(c, sub)
        if kind == "strbefore":
            return (
                F.when(pos > 0, F.substring_index(c, sub, 1)).otherwise(
                    F.lit("")
                ),
                False,
            )
        return (
            F.when(
                pos > 0, F.substring(c, pos + len(sub), 2**31 - 1)
            ).otherwise(F.lit("")),
            False,
        )
    if kind in ("iri", "uri"):
        # IRI(expr): the minting idiom (BIND(IRI(concat(base, ?slug)) AS
        # ?u)) — the value is the string; BIND/SELECT-expr sites consult
        # _expr_is_iri to set the term-kind flag
        return _value(ast[1], bound)[0], False
    if kind in ("md5", "sha1", "sha256"):
        c, _ = _value(ast[1], bound)
        if kind == "sha256":
            return F.sha2(c, 256), False
        return (F.md5 if kind == "md5" else F.sha1)(c), False
    if kind == "coalesce":
        vals = [_value(a, bound) for a in ast[1:]]
        return F.coalesce(*[v for v, _ in vals]), all(n for _, n in vals)
    if kind == "if":
        cond = _compile_filter(ast[1], bound)
        tc, tn = _value(ast[2], bound)
        ec, en = _value(ast[3], bound)
        return F.when(cond, tc).otherwise(ec), tn and en
    if kind in ("abs", "round", "floor", "ceil"):
        c = _value(ast[1], bound)[0].try_cast("double")
        return {
            "abs": F.abs, "round": F.round, "floor": F.floor, "ceil": F.ceil,
        }[kind](c), True
    if kind == "lang":
        t = ast[1]
        if t[0] != "term" or t[1].kind != "var":
            raise SparqlUnsupportedError("lang() over non-variable")
        if t[1].value not in bound:
            return F.lit(None).cast("string"), False
        # SPARQL lang() returns "" for plain literals / IRIs
        return F.coalesce(F.col(f"{t[1].value}__lang"), F.lit("")), False
    if ast[0] != "term":
        raise SparqlUnsupportedError("arithmetic in FILTER not supported")
    term: Term = ast[1]
    if term.kind == "var":
        if term.value not in bound:
            return F.lit(None).cast("string"), False
        return F.col(term.value), False
    is_num = term.kind == "lit" and re.fullmatch(r"[+-]?\d+(?:\.\d+)?", term.value)
    return F.lit(term.value), bool(is_num)


def _const_str(ast) -> str:
    if ast[0] == "term" and ast[1].kind == "lit":
        return ast[1].value
    raise SparqlUnsupportedError("expected string literal")


def _const_num(ast) -> str:
    if (
        ast[0] == "term"
        and ast[1].kind == "lit"
        and re.fullmatch(r"[+-]?\d+(?:\.\d+)?", ast[1].value)
    ):
        return ast[1].value
    raise SparqlUnsupportedError("expected numeric literal")


def _expr_vars(ast) -> set[str]:
    """All variables referenced by an expression AST."""
    if not isinstance(ast, tuple):
        return set()
    if ast[0] == "term":
        return {ast[1].value} if ast[1].kind == "var" else set()
    if ast[0] == "in":  # ('in', negated, expr, [terms])
        return _expr_vars(ast[2])
    out: set[str] = set()
    for part in ast[1:]:
        if isinstance(part, tuple):
            out |= _expr_vars(part)
    return out


def _agg_column(a: AggItem, bound: set[str]) -> F.Column:
    """AggItem → Spark aggregate expression over a variable or a general
    expression (``SUM(?a * ?b)``). SUM/AVG follow SPARQL numeric semantics
    (operands treated as numbers); MIN/MAX compare the expression's native
    column — lexically for plain variables (matches rdflib's behavior for
    plain literals), numerically for arithmetic; GROUP_CONCAT sorts
    elements for determinism (SPARQL leaves the order unspecified — a
    distributed engine must pin it or break idempotent re-runs)."""
    col = _value(a.expr, bound)[0] if a.expr is not None else None
    if a.fn == "count":
        if col is None:
            c = F.count(F.lit(1))
        elif a.distinct:
            c = F.countDistinct(col)
        else:
            c = F.count(col)
    elif a.fn == "sum":
        c = (F.sum_distinct if a.distinct else F.sum)(col.try_cast("double"))
    elif a.fn == "avg":
        if a.distinct:
            raise SparqlUnsupportedError("AVG(DISTINCT) not supported")
        c = F.avg(col.try_cast("double"))
    elif a.fn == "min":
        c = F.min(col)
    elif a.fn == "max":
        c = F.max(col)
    elif a.fn == "sample":
        c = F.first(col, ignorenulls=True)
    elif a.fn == "group_concat":
        lst = F.collect_set(col) if a.distinct else F.collect_list(col)
        c = F.array_join(F.sort_array(lst), a.separator)
    else:  # pragma: no cover — parser rejects unknown aggregates
        raise SparqlUnsupportedError(f"unsupported aggregate {a.fn!r}")
    return c.alias(a.alias)


def _flags(vars_: list[str]) -> list[str]:
    return [f"{v}__{suffix}" for v in vars_ for suffix in ("uri", "lang")]


def _solutions(
    triples: DataFrame, pos_triples: DataFrame | None, q: Query
) -> tuple[DataFrame, list[str], set[str]]:
    """Full SELECT pipeline (WHERE → agg → HAVING → project → DISTINCT →
    ORDER/OFFSET/LIMIT) keeping each output variable's ``__uri``/``__lang``
    flag columns, so the result can re-enter a pattern join — the shape a
    ``{ SELECT … }`` subquery needs. Returns (df, projection order,
    maybe-null vars). Aggregate aliases are plain literals (flags
    false/null); their value column keeps its native Spark type (long/
    double/string), which only shows if the outer query joins on one."""
    df, bound, nullable = _join_group(triples, pos_triples, q.where)
    if q.aggregates or q.group_by:
        # aggregates used inline in HAVING (no AS alias) become hidden
        # aggregate columns computed in the same groupBy, filtered on, then
        # dropped by the projection
        hidden: dict[tuple, AggItem] = {}

        def _lift_haggs(ast):
            if not isinstance(ast, tuple):
                return ast
            if ast[0] == "hagg":
                _, fn, distinct, e = ast
                item = hidden.get(ast)
                if item is None:
                    var = (
                        e[1].value
                        if e is not None and e[0] == "term" and e[1].kind == "var"
                        else None
                    )
                    item = AggItem(
                        fn, var, f"__having_{len(hidden)}", distinct, " ", e
                    )
                    hidden[ast] = item
                return ("term", Term("var", item.alias))
            return tuple(
                _lift_haggs(p) if isinstance(p, tuple) else p for p in ast
            )

        having = [_lift_haggs(h) for h in q.having]
        agg_items = list(q.aggregates) + list(hidden.values())

        needed = set(q.group_by)
        for a in agg_items:
            if a.expr is not None:
                needed |= _expr_vars(a.expr)
        missing = sorted(needed - bound)
        if missing:
            raise SparqlUnsupportedError(f"vars not bound in WHERE: {missing}")
        if agg_items:
            out = df.groupBy(*q.group_by, *_flags(q.group_by)).agg(
                *[_agg_column(a, bound) for a in agg_items]
            )
        else:
            # GROUP BY with no aggregate in SELECT: one row per group
            out = df.select(*q.group_by, *_flags(q.group_by)).distinct()
        for a in q.aggregates:
            out = out.withColumn(f"{a.alias}__uri", F.lit(False)).withColumn(
                f"{a.alias}__lang", F.lit(None).cast("string")
            )
        bound_after = set(q.group_by) | {a.alias for a in agg_items}
        for h in having:
            out = out.filter(_compile_filter(h, bound_after))
        out = _apply_select_exprs(out, q.select_exprs, bound_after)
        out = out.select(*q.select_order, *_flags(q.select_order))
        if q.distinct:
            # projection can be narrower than the grouping keys
            out = out.distinct()
        out_vars = list(q.select_order)
        out_null = (nullable & set(q.group_by)) | {
            a.alias
            for a in q.aggregates
            if a.expr is not None
            and (_expr_vars(a.expr) & nullable)
            and a.fn != "count"
        }
        out_null |= {alias for alias, _e in q.select_exprs}
        out_null &= set(out_vars)
    else:
        df = _apply_select_exprs(df, q.select_exprs, bound)
        out_vars = q.select_order or q.select_vars or sorted(bound)
        aliases = {alias for alias, _e in q.select_exprs}
        missing = [v for v in out_vars if v not in bound and v not in aliases]
        if missing:
            raise SparqlUnsupportedError(f"SELECT vars not bound in WHERE: {missing}")
        out = df.select(*out_vars, *_flags(out_vars))
        if q.distinct:
            out = out.distinct()
        out_null = (nullable | aliases) & set(out_vars)
    if q.order_by:
        out = out.orderBy(*_order_cols(q.order_by, set(out_vars)))
    if q.offset is not None:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out, out_vars, out_null


def _apply_select_exprs(
    df: DataFrame, select_exprs: list[tuple[str, tuple]], bound: set[str]
) -> DataFrame:
    """Non-aggregate ``(expr AS ?alias)`` projections → withColumn, same
    lexical/plain-literal model as BIND (value cast to string, flags
    false/null). Under aggregation ``bound`` is the post-agg name set
    (group keys + aggregate aliases)."""
    for alias, e in select_exprs:
        missing = sorted(_expr_vars(e) - bound)
        if missing:
            raise SparqlUnsupportedError(
                f"SELECT expression references unbound vars: {missing}"
            )
        df = (
            df.withColumn(alias, _value(e, bound)[0].cast("string"))
            .withColumn(f"{alias}__uri", F.lit(_expr_is_iri(e)))
            .withColumn(f"{alias}__lang", F.lit(None).cast("string"))
        )
    return df


def _expr_is_iri(ast) -> bool:
    """True when an expression's result is an IRI term (the IRI()/URI()
    constructor) rather than a plain literal."""
    return isinstance(ast, tuple) and ast[0] in ("iri", "uri")


def _order_cols(order_by, bound: set[str]) -> list[F.Column]:
    """ORDER BY items → sort columns. Expressions may reference projected
    variables only (ordering happens on the projected solution frame)."""
    cols = []
    for e, asc in order_by:
        missing = sorted(_expr_vars(e) - bound)
        if missing:
            raise SparqlUnsupportedError(
                f"ORDER BY references unprojected vars: {missing}"
            )
        c, _ = _value(e, bound)
        cols.append(c.asc() if asc else c.desc())
    return cols


def sparql_select(
    triples: DataFrame, query: str, pos_triples: DataFrame | None = None
) -> DataFrame:
    """Compile a SPARQL SELECT of the supported subset against a triples
    DataFrame (TRIPLES schema: subj/pred/obj/obj_is_uri[/obj_lang]).
    Column names of the result are the variable names without '?'.

    ``pos_triples``: the POS-layout table; constant-predicate patterns scan
    it instead (partition-pruned to one predicate)."""
    q = parse_sparql(query)
    if q.form != "select":
        raise SparqlUnsupportedError(
            f"use the sparql_{q.form} entry point for {q.form.upper()}"
        )
    out, out_vars, _null = _solutions(triples, pos_triples, q)
    return out.select(*out_vars)


def sparql_construct(
    triples: DataFrame, query: str, pos_triples: DataFrame | None = None
) -> DataFrame:
    """SPARQL CONSTRUCT → a triples DataFrame (subj, pred, obj, obj_is_uri)
    with graph (set) semantics, matching ``TripleStore.construct``'s
    contract of returning a graph."""
    q = parse_sparql(query)
    if q.form != "construct":
        raise SparqlUnsupportedError("use sparql_select for SELECT")
    df, bound, _nullable = _join_group(triples, pos_triples, q.where)

    outs = []
    for pat in q.template:
        def col_of(t: Term) -> tuple[F.Column, F.Column]:
            if t.is_const:
                return F.lit(t.value), F.lit(t.kind == "iri")
            if t.value not in bound:
                raise SparqlUnsupportedError(
                    f"template var ?{t.value} not bound in WHERE"
                )
            return F.col(t.value), F.col(f"{t.value}__uri")

        s, _ = col_of(pat.s)
        p, _ = col_of(pat.p)
        o, o_uri = col_of(pat.o)
        outs.append(
            df.select(
                s.alias("subj"), p.alias("pred"), o.alias("obj"),
                o_uri.alias("obj_is_uri"),
            )
        )
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    # graph semantics: no duplicate triples; template rows from unbound
    # OPTIONAL vars are dropped (cannot assert a triple with a null node)
    return (
        out.filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        ).distinct()
    )


def sparql_ask(
    triples: DataFrame, query: str, pos_triples: DataFrame | None = None
) -> DataFrame:
    """SPARQL ASK → a one-row DataFrame ``(ask: boolean)``. The WHERE group
    compiles exactly as for SELECT; the existence test is a LIMIT 1 over the
    solution frame (Catalyst stops the scan at the first match — a
    CollectLimit, not a full count)."""
    q = parse_sparql(query)
    if q.form != "ask":
        raise SparqlUnsupportedError(
            f"use the sparql_{q.form} entry point for {q.form.upper()}"
        )
    df, _bound, _null = _join_group(triples, pos_triples, q.where)
    return (
        df.select(F.lit(1).alias("__one"))
        .limit(1)
        .agg((F.count("__one") > F.lit(0)).alias("ask"))
    )


def sparql_describe(
    triples: DataFrame, query: str, pos_triples: DataFrame | None = None
) -> DataFrame:
    """SPARQL DESCRIBE → every triple whose SUBJECT is a described resource
    (the resources named by IRI plus the bindings of the described
    variables). Output has the TRIPLES shape of the input frame.

    Documented simplification vs the spec's implementation-defined Concise
    Bounded Description: subject rows only, no blank-node recursion (the
    engine's graphs have no blank nodes — every subject is a minted URI)."""
    q = parse_sparql(query)
    if q.form != "describe":
        raise SparqlUnsupportedError(
            f"use the sparql_{q.form} entry point for {q.form.upper()}"
        )
    iris = [t.value for t in q.describe_targets if t.kind != "var"]
    vars_ = [t.value for t in q.describe_targets if t.kind == "var"]
    nodes: DataFrame | None = None
    if vars_:
        df, bound, _null = _join_group(triples, pos_triples, q.where)
        missing = [v for v in vars_ if v not in bound]
        if missing:
            raise SparqlUnsupportedError(
                f"DESCRIBE vars not bound in WHERE: {missing}"
            )
        # solution modifiers scope the set of described resources
        if q.order_by:
            df = df.orderBy(*_order_cols(q.order_by, bound))
        if q.offset is not None:
            df = df.offset(q.offset)
        if q.limit is not None:
            df = df.limit(q.limit)
        nodes = df.select(F.col(vars_[0]).alias("subj"))
        for v in vars_[1:]:
            nodes = nodes.unionByName(df.select(F.col(v).alias("subj")))
    if iris:
        idf = triples.sparkSession.createDataFrame(
            [(i,) for i in iris], "subj string"
        )
        nodes = idf if nodes is None else nodes.unionByName(idf)
    assert nodes is not None  # parser guarantees ≥1 target
    # left semi against the (small) resource set — broadcast by Catalyst
    return triples.join(nodes.distinct(), on="subj", how="left_semi")
