"""Pure-Python XSLT 1.0 subset engine (SURVEY §2.1 T10).

Reference analog: ``Transformer`` applies ``res/xsl/*.xsl`` stylesheets to
the parsed XHTML+RDFa files, producing the browser-facing HTML
([ref: ferenda/transformer.py :: Transformer.transform,
ferenda/res/xsl/generic.xsl]). The reference leans on ``lxml.etree.XSLT``;
this sandbox has no lxml, and a full XSLT processor is out of scope — so
this module implements the *subset of XSLT 1.0 that the reference's
stylesheets actually use*, over ``xml.etree.ElementTree``:

- ``xsl:template`` (match patterns: names, ``*``, ``text()``, ``/``, path
  steps, ``//``, attribute predicates; ``priority``; ``mode``),
- ``xsl:apply-templates`` (``select``, ``mode``, ``xsl:sort``),
- ``xsl:for-each`` (+ ``xsl:sort``), ``xsl:value-of``, ``xsl:if``,
  ``xsl:choose/when/otherwise``, ``xsl:copy``, ``xsl:copy-of``,
  ``xsl:element``, ``xsl:attribute``, ``xsl:text``,
  ``xsl:variable``/``xsl:param`` (string / node-set values),
- literal result elements with ``{…}`` attribute value templates,
- an XPath 1.0 expression subset: relative/absolute paths, ``//``, ``.``
  ``..`` ``@attr`` ``text()`` ``*``, predicates (positional + boolean),
  ``|`` union, ``and``/``or``/``not()``, ``= != < > <= >=``, ``$vars``,
  ``string() concat() count() contains() starts-with() normalize-space()
  name() local-name() position() last() number() string-length()
  substring() substring-before() substring-after()``.

Two deliberate deviations, documented for stylesheet authors:

- **names match on local-name**: the XHTML default namespace (and RDFa
  attribute names) are compared by local part, so stylesheets need no
  ``xhtml:`` prefix plumbing. This matches how the reference's stylesheets
  address elements in practice (they declare the XHTML ns once and prefix
  every step); a collision between two namespaces' local names does not
  occur in this pipeline's documents.
- no ``document()`` / keys / number formatting; external inputs arrive as
  string parameters instead (``transform(..., params={...})``), mirroring
  how the Spark layer passes the annotation payload as a column.

Engine design notes for the Spark context: ``compile_stylesheet`` is
pure-CPU and cache-friendly (the operators layer memoizes it per worker
process keyed on the stylesheet hash), ``transform`` holds only one
document tree at a time, and nothing here touches the filesystem — so the
per-row work is embarrassingly parallel under ``mapInPandas`` with zero
shuffle (see operators/transformer.py).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

XSL_NS = "http://www.w3.org/1999/XSL/Transform"

__all__ = ["compile_stylesheet", "transform", "XsltError", "Stylesheet"]


class XsltError(ValueError):
    """Stylesheet uses a construct outside the implemented subset, or the
    input document / expression is malformed."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if tag.startswith("{") else tag


def _is_xsl(el: ET.Element, name: str | None = None) -> bool:
    if not el.tag.startswith("{" + XSL_NS + "}"):
        return False
    return name is None or _local(el.tag) == name


# ---------------------------------------------------------------------------
# Document model: ElementTree elements + explicit text nodes + parent links.


@dataclass
class TextNode:
    value: str
    parent: object  # ElemNode


@dataclass
class ElemNode:
    elem: ET.Element
    parent: object  # ElemNode | None (None at the root element)
    _children: list | None = field(default=None, repr=False)

    @property
    def name(self) -> str:
        return _local(self.elem.tag)

    def children(self) -> list:
        if self._children is None:
            out: list = []
            if self.elem.text:
                out.append(TextNode(self.elem.text, self))
            for c in self.elem:
                cn = ElemNode(c, self)
                out.append(cn)
                if c.tail:
                    out.append(TextNode(c.tail, self))
            self._children = out
        return self._children

    def attr(self, name: str) -> str | None:
        for k, v in self.elem.attrib.items():
            if _local(k) == name:
                return v
        return None


@dataclass
class RootNode:
    """The XPath root (parent of the document element)."""

    doc: ElemNode

    def children(self) -> list:
        return [self.doc]


def _string_value(node) -> str:
    if isinstance(node, TextNode):
        return node.value
    if isinstance(node, str):  # attribute value
        return node
    if isinstance(node, RootNode):
        return _string_value(node.doc)
    return "".join(
        c if isinstance(c, str) else _string_value(c)
        for c in node.elem.itertext()
    )


# ---------------------------------------------------------------------------
# XPath subset: tokenizer + recursive-descent parser producing closures.

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<dslash>//)"
    r"|(?P<op><=|>=|!=|[=<>|/\[\]()@,.*])"
    r"|(?P<var>\$[\w.-]+)"
    r"|(?P<name>[\w][\w.-]*(?::[\w.-]+)?)"
    r")"
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip() == "":
                break
            raise XsltError(f"bad XPath near {s[i:]!r} in {s!r}")
        i = m.end()
        for kind in ("num", "str", "dslash", "op", "var", "name"):
            v = m.group(kind)
            if v is not None:
                if kind == "op" and v == ".." :
                    pass
                out.append((kind, v))
                break
    return out


class _Ctx:
    """Evaluation context: current node, position/size, variables."""

    __slots__ = ("node", "pos", "size", "vars")

    def __init__(self, node, pos: int, size: int, vars_: dict):
        self.node = node
        self.pos = pos
        self.size = size
        self.vars = vars_


def _to_string(v) -> str:
    if isinstance(v, list):
        return _string_value(v[0]) if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else repr(v)
    return str(v)


def _to_bool(v) -> bool:
    if isinstance(v, list):
        return bool(v)
    if isinstance(v, str):
        return v != ""
    return bool(v)


def _to_num(v) -> float:
    try:
        return float(_to_string(v)) if not isinstance(v, (int, float, bool)) else float(v)
    except ValueError:
        return float("nan")


class _XPath:
    """Parser state over a token list; parse methods return evaluator
    closures ``f(ctx) -> value`` (value: node list / str / float / bool)."""

    def __init__(self, tokens: list[tuple[str, str]], src: str):
        self.toks = tokens
        self.i = 0
        self.src = src

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        kind, v = self._next()
        if v != val:
            raise XsltError(f"expected {val!r} in XPath {self.src!r}, got {v!r}")

    # expr := or_expr
    def parse(self):
        e = self._or()
        if self.i != len(self.toks):
            raise XsltError(f"trailing tokens in XPath {self.src!r}")
        return e

    def _or(self):
        left = self._and()
        while self._peek() == ("name", "or"):
            self._next()
            right = self._and()
            left = (lambda a, b: lambda c: _to_bool(a(c)) or _to_bool(b(c)))(left, right)
        return left

    def _and(self):
        left = self._cmp()
        while self._peek() == ("name", "and"):
            self._next()
            right = self._cmp()
            left = (lambda a, b: lambda c: _to_bool(a(c)) and _to_bool(b(c)))(left, right)
        return left

    def _cmp(self):
        left = self._union()
        kind, v = self._peek()
        if kind == "op" and v in ("=", "!=", "<", ">", "<=", ">="):
            self._next()
            right = self._union()

            def cmp(c, a=left, b=right, op=v):
                va, vb = a(c), b(c)
                # node-set comparison is existential over string-values
                sa = [_string_value(n) for n in va] if isinstance(va, list) else [va]
                sb = [_string_value(n) for n in vb] if isinstance(vb, list) else [vb]
                for x in sa:
                    for y in sb:
                        if op in ("=", "!="):
                            hit = (_to_string(x) == _to_string(y)) == (op == "=")
                        else:
                            nx, ny = _to_num(x), _to_num(y)
                            hit = {"<": nx < ny, ">": nx > ny,
                                   "<=": nx <= ny, ">=": nx >= ny}[op]
                        if hit:
                            return True
                return False

            return cmp
        return left

    def _union(self):
        left = self._path()
        while self._peek() == ("op", "|"):
            self._next()
            right = self._path()

            def union(c, a=left, b=right):
                va, vb = a(c), b(c)
                if not (isinstance(va, list) and isinstance(vb, list)):
                    raise XsltError(f"'|' over non-node-sets in {self.src!r}")
                seen, out = set(), []
                for n in va + vb:
                    k = id(n.elem) if isinstance(n, ElemNode) else id(n)
                    if k not in seen:
                        seen.add(k)
                        out.append(n)
                return out

            left = union
        return left

    # path := primary ('/'|'//' step)*  |  ('/'|'//')? step ('/'|'//' step)*
    def _path(self):
        kind, v = self._peek()
        steps: list = []
        if kind == "num":
            self._next()
            return lambda c, n=float(v): n
        if kind == "str":
            self._next()
            return lambda c, s=v[1:-1]: s
        if kind == "var":
            self._next()
            name = v[1:]

            def var(c, name=name):
                if name not in c.vars:
                    raise XsltError(f"unbound variable ${name}")
                return c.vars[name]

            base = var
            if self._peek()[1] not in ("/", "//"):
                return base
            steps.append(("base", base))
        elif v == "(":
            self._next()
            inner = self._or()
            self._expect(")")
            if self._peek()[1] not in ("/", "//"):
                return inner
            steps.append(("base", inner))
        elif kind == "name" and self._peek_ahead() == ("op", "(") and v not in ("text", "node"):
            return self._func(v)
        elif v in ("/", "//"):
            absolute = v
            self._next()
            steps.append(("root", None))
            if absolute == "//":
                steps.append(("descend", None))
            if self._peek()[0] is None or self._peek()[1] in ("]", ")", ",", "|"):
                pass  # bare '/'
            else:
                steps.extend(self._steps())
        else:
            steps.extend(self._steps())
        while self._peek()[1] in ("/", "//"):
            _, sep = self._next()
            if sep == "//":
                steps.append(("descend", None))
            steps.extend(self._steps_one())
        return self._compile_steps(steps)

    def _peek_ahead(self):
        return self.toks[self.i + 1] if self.i + 1 < len(self.toks) else (None, None)

    def _steps(self):
        out = self._steps_one()
        return out

    def _steps_one(self):
        kind, v = self._peek()
        preds = []
        if v == ".":
            self._next()
            if self._peek() == ("op", "."):  # '..'
                self._next()
                axis = ("parent", None)
            else:
                axis = ("self", None)
        elif v == "@":
            self._next()
            kind2, name = self._next()
            if kind2 != "name" and name != "*":
                raise XsltError(f"bad attribute step in {self.src!r}")
            axis = ("attr", _local_q(name))
        elif v == "*":
            self._next()
            axis = ("child", "*")
        elif kind == "name":
            self._next()
            if self._peek() == ("op", "("):
                if v in ("text", "node"):
                    self._next()
                    self._expect(")")
                    axis = ("child", "text()" if v == "text" else "node()")
                else:
                    raise XsltError(f"unexpected call {v}() mid-path in {self.src!r}")
            else:
                axis = ("child", _local_q(v))
        else:
            raise XsltError(f"bad step near {v!r} in XPath {self.src!r}")
        while self._peek() == ("op", "["):
            self._next()
            preds.append(self._or())
            self._expect("]")
        return [("step", (axis, preds))]

    def _func(self, name: str):
        self._next()  # name
        self._expect("(")
        args = []
        if self._peek() != ("op", ")"):
            args.append(self._or())
            while self._peek() == ("op", ","):
                self._next()
                args.append(self._or())
        self._expect(")")
        return _FUNCS_COMPILE(name, args, self.src)

    def _compile_steps(self, steps):
        def run(c: _Ctx):
            nodes = [c.node]
            for op, arg in steps:
                if op == "base":
                    v = arg(c)
                    if not isinstance(v, list):
                        raise XsltError(f"path step over non-node-set in {self.src!r}")
                    nodes = v
                elif op == "root":
                    r = nodes[0] if nodes else c.node
                    while isinstance(r, (ElemNode, TextNode)) and r.parent is not None:
                        r = r.parent
                    if isinstance(r, (ElemNode, TextNode)):
                        r = RootNode(r if isinstance(r, ElemNode) else r.parent)
                    nodes = [r]
                elif op == "descend":
                    out = []
                    for n in nodes:
                        out.extend(_descend_or_self(n))
                    nodes = out
                elif op == "step":
                    (axis, name), preds = arg
                    groups: list[list] = []
                    for n in nodes:
                        groups.append(_axis_nodes(n, axis, name))
                    # apply predicates per origin group (position() is
                    # relative to the step's node list per origin node)
                    out = []
                    for g in groups:
                        for p in preds:
                            g2 = []
                            for i, n in enumerate(g):
                                ctx = _Ctx(n, i + 1, len(g), c.vars)
                                pv = p(ctx)
                                keep = (
                                    (i + 1) == int(pv)
                                    if isinstance(pv, float)
                                    else _to_bool(pv)
                                )
                                if keep:
                                    g2.append(n)
                            g = g2
                        out.extend(g)
                    # de-dup while keeping document order approximation
                    seen, nodes = set(), []
                    for n in out:
                        k = id(n)
                        if k not in seen:
                            seen.add(k)
                            nodes.append(n)
            return nodes

        return run


def _local_q(name: str) -> str:
    """Strip any prefix: names match on local part (module docstring)."""
    return name.split(":", 1)[-1]


def _descend_or_self(n):
    out = [n]
    kids = n.children() if isinstance(n, (ElemNode, RootNode)) else []
    for k in kids:
        if isinstance(k, ElemNode):
            out.extend(_descend_or_self(k))
        else:
            out.append(k)
    return out


def _axis_nodes(n, axis: str, name: str | None) -> list:
    if axis == "self":
        return [n]
    if axis == "parent":
        p = getattr(n, "parent", None)
        return [p] if p is not None else []
    if axis == "attr":
        if not isinstance(n, ElemNode):
            return []
        if name == "*":
            return list(n.elem.attrib.values())
        v = n.attr(name)
        return [v] if v is not None else []
    # child axis
    kids = n.children() if isinstance(n, (ElemNode, RootNode)) else []
    if name == "node()":
        return kids
    if name == "text()":
        return [k for k in kids if isinstance(k, TextNode)]
    if name == "*":
        return [k for k in kids if isinstance(k, ElemNode)]
    return [k for k in kids if isinstance(k, ElemNode) and k.name == name]


def _FUNCS_COMPILE(name: str, args: list, src: str):
    n = len(args)

    def need(k: int):
        if n != k:
            raise XsltError(f"{name}() takes {k} args in {src!r}")

    if name == "string":
        return (lambda c: _to_string(args[0](c))) if n else (lambda c: _string_value(c.node))
    if name == "normalize-space":
        inner = args[0] if n else None
        return lambda c: " ".join(
            (_to_string(inner(c)) if inner else _string_value(c.node)).split()
        )
    if name == "concat":
        return lambda c: "".join(_to_string(a(c)) for a in args)
    if name == "count":
        need(1)
        return lambda c: float(len(args[0](c)))
    if name == "not":
        need(1)
        return lambda c: not _to_bool(args[0](c))
    if name == "true":
        return lambda c: True
    if name == "false":
        return lambda c: False
    if name == "position":
        return lambda c: float(c.pos)
    if name == "last":
        return lambda c: float(c.size)
    if name == "contains":
        need(2)
        return lambda c: _to_string(args[1](c)) in _to_string(args[0](c))
    if name == "starts-with":
        need(2)
        return lambda c: _to_string(args[0](c)).startswith(_to_string(args[1](c)))
    if name == "substring-before":
        need(2)
        return lambda c: _to_string(args[0](c)).split(_to_string(args[1](c)), 1)[0] if _to_string(args[1](c)) in _to_string(args[0](c)) else ""
    if name == "substring-after":
        need(2)
        return lambda c: _to_string(args[0](c)).split(_to_string(args[1](c)), 1)[1] if _to_string(args[1](c)) in _to_string(args[0](c)) else ""
    if name == "substring":
        def substring(c):
            s = _to_string(args[0](c))
            start = int(round(_to_num(args[1](c)))) - 1
            if len(args) > 2:
                ln = int(round(_to_num(args[2](c))))
                return s[max(start, 0): max(start, 0) + max(ln + min(start, 0), 0)]
            return s[max(start, 0):]
        return substring
    if name == "string-length":
        return lambda c: float(len(_to_string(args[0](c)) if n else _string_value(c.node)))
    if name == "number":
        return (lambda c: _to_num(args[0](c))) if n else (lambda c: _to_num(_string_value(c.node)))
    if name in ("name", "local-name"):
        def nm(c):
            tgt = args[0](c) if n else [c.node]
            if not tgt:
                return ""
            t = tgt[0] if isinstance(tgt, list) else tgt
            return t.name if isinstance(t, ElemNode) else ""
        return nm
    raise XsltError(f"unsupported XPath function {name}() in {src!r}")


def _compile_xpath(src: str):
    return _XPath(_tokenize(src), src).parse()


# ---------------------------------------------------------------------------
# Match patterns (template @match): compiled to a (matcher, priority) pair.


def _compile_pattern(src: str):
    """Pattern → list of (match_fn(node)->bool, default_priority) over the
    '|' alternatives. Steps match right-to-left up the ancestry; '//'
    allows a gap; a leading '/' anchors at the root."""
    alts = []
    for part in src.split("|"):
        part = part.strip()
        if part == "/":
            alts.append((lambda n: isinstance(n, RootNode), 0.5))
            continue
        anchored = part.startswith("/") and not part.startswith("//")
        gap_first = part.startswith("//")
        body = part.lstrip("/")
        steps = []
        for raw in re.split(r"(//|/)", body):
            if raw in ("", "/"):
                continue
            if raw == "//":
                steps.append(("gap", None, []))
                continue
            m = re.match(r"^(@?[\w.*-]+(?::[\w.-]+)?|text\(\)|node\(\))(.*)$", raw)
            if not m:
                raise XsltError(f"bad match pattern {src!r}")
            name, rest = m.group(1), m.group(2)
            preds = []
            while rest:
                pm = re.match(r"^\[([^\]]*)\](.*)$", rest)
                if not pm:
                    raise XsltError(f"bad predicate in pattern {src!r}")
                preds.append(_compile_xpath(pm.group(1)))
                rest = pm.group(2)
            steps.append(("test", name, preds))
        if gap_first:
            steps.insert(0, ("gap", None, []))

        def node_test(n, name: str) -> bool:
            name = _local_q(name)
            if name == "*":
                return isinstance(n, ElemNode)
            if name == "text()":
                return isinstance(n, TextNode)
            if name == "node()":
                return isinstance(n, (ElemNode, TextNode))
            return isinstance(n, ElemNode) and n.name == name

        def match(n, steps=steps, anchored=anchored):
            # walk steps right-to-left against n and its ancestors
            i = len(steps) - 1
            cur = n
            gap = False
            while i >= 0:
                kind, name, preds = steps[i]
                if kind == "gap":
                    gap = True
                    i -= 1
                    continue
                if cur is None:
                    return False
                ok = node_test(cur, name) and all(
                    _pred_ok(p, cur) for p in preds
                )
                if ok:
                    cur = getattr(cur, "parent", None)
                    i -= 1
                    gap = False
                elif gap:
                    cur = getattr(cur, "parent", None)
                    if cur is None:
                        return False
                else:
                    return False
            if anchored:
                # remaining ancestry must be exactly the root
                while isinstance(cur, RootNode):
                    return True
                return cur is None or (
                    isinstance(cur, ElemNode) and cur.parent is None
                )
            return True

        last = steps[-1]
        prio = -0.5 if last[1] in ("*", "node()") else 0.0
        if last[2] or len([s for s in steps if s[0] == "test"]) > 1:
            prio = 0.5
        alts.append((match, prio))
    return alts


def _pred_ok(p, node) -> bool:
    ctx = _Ctx(node, 1, 1, {})
    v = p(ctx)
    if isinstance(v, float):
        # positional predicates in match patterns: position among same-name
        # siblings — supported for the common [1] case
        sibs = _axis_nodes(node.parent, "child", node.name) if node.parent else [node]
        return sibs.index(node) + 1 == int(v)
    return _to_bool(v)


# ---------------------------------------------------------------------------
# Stylesheet compilation and the transform driver.


@dataclass
class _Template:
    match: object  # fn(node)->bool
    priority: float
    order: int
    mode: str | None
    body: list  # instruction list


class Stylesheet:
    def __init__(self, templates: list[_Template], params: dict, variables: list):
        self.templates = templates
        self.params = params  # name -> default instruction list | str
        self.variables = variables  # [(name, select|body)]


_WS_BETWEEN = re.compile(r"\S")


def compile_stylesheet(src: str) -> Stylesheet:
    try:
        root = ET.fromstring(src)
    except ET.ParseError as e:
        raise XsltError(f"stylesheet is not well-formed XML: {e}") from e
    if not _is_xsl(root, "stylesheet") and not _is_xsl(root, "transform"):
        raise XsltError("root element must be xsl:stylesheet")
    templates: list[_Template] = []
    params: dict = {}
    variables: list = []
    order = 0
    for child in root:
        if _is_xsl(child, "template"):
            match = child.get("match")
            if not match:
                raise XsltError("named templates (no @match) not supported")
            body = _compile_body(child)
            prio_attr = child.get("priority")
            for fn, dprio in _compile_pattern(match):
                templates.append(
                    _Template(
                        match=fn,
                        priority=float(prio_attr) if prio_attr is not None else dprio,
                        order=order,
                        mode=child.get("mode"),
                        body=body,
                    )
                )
            order += 1
        elif _is_xsl(child, "param"):
            params[child.get("name")] = child.get("select"), _compile_body(child)
        elif _is_xsl(child, "variable"):
            variables.append(
                (child.get("name"), child.get("select"), _compile_body(child))
            )
        elif _is_xsl(child, "output") or _is_xsl(child, "strip-space") or _is_xsl(
            child, "preserve-space"
        ):
            continue  # serialization is fixed (see _serialize); strip-space
            # is implicit for stylesheet whitespace only
        elif _is_xsl(child):
            raise XsltError(f"unsupported top-level xsl:{_local(child.tag)}")
    # higher priority first; later-declared wins ties (XSLT recovery rule)
    templates.sort(key=lambda t: (-t.priority, -t.order))
    return Stylesheet(templates, params, variables)


def _compile_body(el: ET.Element) -> list:
    """Compile an element's content to an instruction list. Instructions are
    ('text', s) | ('value-of', xpath) | ('apply', select|None, mode, sorts)
    | ('for-each', xpath, sorts, body) | ('if', xpath, body)
    | ('choose', [(xpath|None, body)]) | ('elem', name_avt, attrs, body)
    | ('xelem', name_avt, body) | ('attr', name_avt, body)
    | ('copy', body) | ('copy-of', xpath) | ('var', name, select, body)."""
    out: list = []
    if el.text and _WS_BETWEEN.search(el.text):
        out.append(("text", el.text))
    for c in el:
        if _is_xsl(c):
            kind = _local(c.tag)
            if kind == "value-of":
                out.append(("value-of", _compile_xpath(c.get("select"))))
            elif kind == "apply-templates":
                sel = c.get("select")
                out.append(
                    (
                        "apply",
                        _compile_xpath(sel) if sel else None,
                        c.get("mode"),
                        _compile_sorts(c),
                    )
                )
            elif kind == "for-each":
                out.append(
                    (
                        "for-each",
                        _compile_xpath(c.get("select")),
                        _compile_sorts(c),
                        _compile_body(c),
                    )
                )
            elif kind == "if":
                out.append(("if", _compile_xpath(c.get("test")), _compile_body(c)))
            elif kind == "choose":
                branches = []
                for w in c:
                    if _is_xsl(w, "when"):
                        branches.append(
                            (_compile_xpath(w.get("test")), _compile_body(w))
                        )
                    elif _is_xsl(w, "otherwise"):
                        branches.append((None, _compile_body(w)))
                out.append(("choose", branches))
            elif kind == "text":
                out.append(("text", c.text or ""))
            elif kind == "attribute":
                out.append(("attr", _compile_avt(c.get("name")), _compile_body(c)))
            elif kind == "element":
                out.append(("xelem", _compile_avt(c.get("name")), _compile_body(c)))
            elif kind == "copy":
                out.append(("copy", _compile_body(c)))
            elif kind == "copy-of":
                out.append(("copy-of", _compile_xpath(c.get("select"))))
            elif kind in ("variable", "param"):
                sel = c.get("select")
                out.append(
                    (
                        "var",
                        c.get("name"),
                        _compile_xpath(sel) if sel else None,
                        _compile_body(c),
                    )
                )
            elif kind == "sort":
                pass  # handled by the parent's _compile_sorts
            elif kind == "comment":
                out.append(("text", ""))
            else:
                raise XsltError(f"unsupported instruction xsl:{kind}")
        else:
            attrs = [
                (_attr_name_out(k), _compile_avt(v)) for k, v in c.attrib.items()
            ]
            out.append(("elem", _local(c.tag), attrs, _compile_body(c)))
        if c.tail and _WS_BETWEEN.search(c.tail):
            out.append(("text", c.tail))
    return out


def _attr_name_out(k: str) -> str:
    # literal result attributes keep their prefixed form if written with a
    # prefix the source declared; ElementTree gives {uri}local for those —
    # emit the local name (the pipeline's stylesheets use unprefixed attrs)
    return _local(k)


def _compile_sorts(el: ET.Element) -> list:
    sorts = []
    for s in el:
        if _is_xsl(s, "sort"):
            sorts.append(
                (
                    _compile_xpath(s.get("select") or "."),
                    s.get("order", "ascending") == "descending",
                    s.get("data-type", "text"),
                )
            )
    return sorts


_AVT_RE = re.compile(r"\{([^{}]*)\}|\{\{|\}\}")


def _compile_avt(src: str):
    """Attribute value template: literal text with {xpath} holes."""
    parts: list = []
    pos = 0
    for m in _AVT_RE.finditer(src):
        if m.start() > pos:
            parts.append(src[pos : m.start()])
        g = m.group(0)
        if g == "{{":
            parts.append("{")
        elif g == "}}":
            parts.append("}")
        else:
            parts.append(_compile_xpath(m.group(1)))
        pos = m.end()
    if pos < len(src):
        parts.append(src[pos:])

    def run(ctx):
        return "".join(p if isinstance(p, str) else _to_string(p(ctx)) for p in parts)

    return run


# --- output construction ---------------------------------------------------

def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


class _Out:
    """Result-tree builder: a stack of open elements; attributes may only be
    added before the first child/text of the current element."""

    def __init__(self):
        self.buf: list[str] = []
        self.stack: list[list] = []  # open elements: [name, attrs, has_content]

    def start(self, name: str):
        self._flush_open()
        self.stack.append([name, [], False])

    def attr(self, name: str, value: str):
        if not self.stack or self.stack[-1][2]:
            raise XsltError(
                f"xsl:attribute {name!r} after content was written"
            )
        self.stack[-1][1].append((name, value))

    def text(self, s: str, raw: bool = False):
        if not s:
            return
        self._flush_open()
        self.buf.append(s if raw else _esc_text(s))

    def end(self):
        name, attrs, had = self.stack[-1]
        if not had:
            # open tag not yet flushed
            self._emit_open(name, attrs, self_close=True)
            self.stack.pop()
            return
        self.stack.pop()
        self.buf.append(f"</{name}>")

    def _flush_open(self):
        if self.stack and not self.stack[-1][2]:
            name, attrs, _ = self.stack[-1]
            self._emit_open(name, attrs, self_close=False)
            self.stack[-1][2] = True

    def _emit_open(self, name, attrs, self_close: bool):
        # empty elements self-close — the output is XHTML (well-formed XML
        # that browsers render), matching the reference's generated files
        a = "".join(f' {k}="{_esc_attr(v)}"' for k, v in attrs)
        self.buf.append(f"<{name}{a}/>" if self_close else f"<{name}{a}>")

    def result(self) -> str:
        if self.stack:
            raise XsltError("unclosed output element")
        return "".join(self.buf)


# --- the apply-templates engine ---------------------------------------------


class _Engine:
    def __init__(self, sheet: Stylesheet, global_vars: dict):
        self.sheet = sheet
        self.globals = global_vars

    def find_template(self, node, mode: str | None) -> _Template | None:
        for t in self.sheet.templates:
            if t.mode == mode and t.match(node):
                return t
        return None

    def apply(self, nodes: list, mode: str | None, out: _Out, vars_: dict):
        for i, n in enumerate(nodes):
            ctx = _Ctx(n, i + 1, len(nodes), vars_)
            t = self.find_template(n, mode)
            if t is not None:
                self.run_body(t.body, ctx, out)
            elif isinstance(n, TextNode):
                out.text(n.value)  # built-in rule: copy text
            elif isinstance(n, str):
                out.text(n)
            else:  # built-in rule: recurse into children
                kids = n.children()
                self.apply(kids, mode, out, vars_)

    def run_body(self, body: list, ctx: _Ctx, out: _Out):
        vars_ = ctx.vars
        for ins in body:
            op = ins[0]
            if op == "text":
                out.text(ins[1])
            elif op == "value-of":
                out.text(_to_string(ins[1](ctx)))
            elif op == "apply":
                _, sel, mode, sorts = ins
                nodes = (
                    sel(ctx)
                    if sel
                    else (ctx.node.children() if isinstance(ctx.node, (ElemNode, RootNode)) else [])
                )
                if not isinstance(nodes, list):
                    raise XsltError("apply-templates select is not a node-set")
                nodes = _sorted_nodes(nodes, sorts, vars_)
                self.apply(nodes, mode, out, vars_)
            elif op == "for-each":
                _, sel, sorts, fbody = ins
                nodes = sel(ctx)
                if not isinstance(nodes, list):
                    raise XsltError("for-each select is not a node-set")
                nodes = _sorted_nodes(nodes, sorts, vars_)
                for i, n in enumerate(nodes):
                    self.run_body(fbody, _Ctx(n, i + 1, len(nodes), vars_), out)
            elif op == "if":
                if _to_bool(ins[1](ctx)):
                    self.run_body(ins[2], ctx, out)
            elif op == "choose":
                for test, bbody in ins[1]:
                    if test is None or _to_bool(test(ctx)):
                        self.run_body(bbody, ctx, out)
                        break
            elif op == "elem":
                _, name, attrs, ebody = ins
                out.start(name)
                for aname, avt in attrs:
                    out.attr(aname, avt(ctx))
                self.run_body(ebody, ctx, out)
                out.end()
            elif op == "xelem":
                out.start(ins[1](ctx))
                self.run_body(ins[2], ctx, out)
                out.end()
            elif op == "attr":
                sub = _Out()
                sub.stack.append(["__attr__", [], True])
                self.run_body(ins[2], ctx, sub)
                sub.stack.pop()
                out.attr(ins[1](ctx), _unescape(sub.result()))
            elif op == "copy":
                n = ctx.node
                if isinstance(n, TextNode):
                    out.text(n.value)
                elif isinstance(n, ElemNode):
                    out.start(n.name)
                    self.run_body(ins[1], ctx, out)
                    out.end()
                else:
                    self.run_body(ins[1], ctx, out)
            elif op == "copy-of":
                v = ins[1](ctx)
                if isinstance(v, list):
                    for n in v:
                        _copy_node(n, out)
                else:
                    out.text(_to_string(v))
            elif op == "var":
                _, name, sel, vbody = ins
                if sel is not None:
                    val = sel(ctx)
                else:
                    sub = _Out()
                    sub.stack.append(["__var__", [], True])
                    self.run_body(vbody, ctx, sub)
                    sub.stack.pop()
                    val = _unescape(sub.result())
                vars_ = dict(vars_)
                vars_[name] = val
                ctx = _Ctx(ctx.node, ctx.pos, ctx.size, vars_)
            else:  # pragma: no cover
                raise XsltError(f"bad instruction {op!r}")


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", '"').replace("&amp;", "&")
    )


def _copy_node(n, out: _Out):
    if isinstance(n, TextNode):
        out.text(n.value)
    elif isinstance(n, str):
        out.text(n)
    elif isinstance(n, ElemNode):
        out.start(n.name)
        for k, v in n.elem.attrib.items():
            out.attr(_local(k), v)
        for c in n.children():
            _copy_node(c, out)
        out.end()
    elif isinstance(n, RootNode):
        _copy_node(n.doc, out)


def _sorted_nodes(nodes: list, sorts: list, vars_: dict) -> list:
    if not sorts:
        return nodes
    # stable multi-key sort: apply keys last-to-first (Python's sort is
    # stable, so earlier keys dominate), each with its own order/data-type
    out = list(enumerate(nodes))
    size = len(nodes)
    for sel, desc, dtype in reversed(sorts):
        def key(pair, sel=sel, dtype=dtype):
            i, n = pair
            v = _to_string(sel(_Ctx(n, i + 1, size, vars_)))
            return _to_num(v) if dtype == "number" else v

        out.sort(key=key, reverse=desc)
    return [n for _i, n in out]


def transform(sheet: Stylesheet, doc_xml: str, params: dict | None = None) -> str:
    """Apply a compiled stylesheet to one XML document string."""
    try:
        root_el = ET.fromstring(doc_xml)
    except ET.ParseError as e:
        raise XsltError(f"input is not well-formed XML: {e}") from e
    doc = ElemNode(root_el, None)
    root = RootNode(doc)

    global_vars: dict = {}
    for name, (sel, body) in sheet.params.items():
        if params and name in params:
            global_vars[name] = params[name]
        elif sel:
            global_vars[name] = _compile_xpath(sel)(_Ctx(root, 1, 1, global_vars))
        else:
            global_vars[name] = ""
    engine = _Engine(sheet, global_vars)
    for name, sel, body in sheet.variables:
        if sel:
            global_vars[name] = _compile_xpath(sel)(_Ctx(root, 1, 1, global_vars))
        else:
            sub = _Out()
            sub.stack.append(["__var__", [], True])
            engine.run_body(body, _Ctx(root, 1, 1, global_vars), sub)
            sub.stack.pop()
            global_vars[name] = _unescape(sub.result())

    out = _Out()
    engine.apply([root], None, out, global_vars)
    return out.result()
