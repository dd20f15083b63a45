"""JQL-subset → DataFrame compiler (SURVEY §2.2 P5-P18, §4.2).

The reference never *parses* JQL — it generates it from templates
(pkg/jql/builder.go:39-246, pkg/jql/jira_builder.go:61-162) and pushes the
string to the JIRA server. Re-expressed on Spark, the server is us: this
module parses exactly the JQL subset those templates emit and compiles it
to a DataFrame transformation, after which Catalyst does the optimizing
(predicate pushdown, CNF, OptimizeIn — the rewrites the reference hand-rolls
at pkg/jql/jira_builder.go:195-234 come free).

Supported surface (every emitted form, SURVEY §2.2):
  =, !=, >, >=, <, <=, ~ (contains)        P5, P12
  IN (...), NOT IN (...)                    P11
  AND / OR / NOT, parentheses               P10
  relative dates  -Nd / -Nw / -Nh           P13 (vs ctx.now, deterministic)
  currentUser()                             P14 (ctx.current_user)
  sprint in openSprints()                   P14 (ctx.open_sprint_member)
  issuesInEpic("K") / linkedIssues("K")     P8, P9 (membership via joins)
  IS EMPTY / IS NOT EMPTY                   null checks
  ORDER BY field ASC|DESC [, ...]           W1, W2
  quoted fields ("Epic Link"), cf[NNNN]     P2, P6
  WAS [NOT] v / WAS [NOT] IN (...)          history (changelog semi-join)
    [BY u] [AFTER d] [BEFORE d]
  CHANGED [FROM a] [TO b] [BY u]            history (transition rows)
    [AFTER d] [BEFORE d] [DURING (a, b)]

Membership subqueries compile to LEFT-join boolean marker columns (not
left_semi) so they compose under OR/NOT — `"Epic Link" = K OR parent in
(issuesInEpic(K))` is a single plan with one broadcastable member-set join.

Validation (F9 — pkg/jql/builder.go:267-321): balanced quotes (escape-aware),
balanced parens, duplicated AND/OR. Exposed as ``validate()``; ``parse()``
raises ``JQLError`` on the same conditions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Field name → issues-table column mapping (SURVEY §1.3 / FIXTURES.md)
# ---------------------------------------------------------------------------

FIELD_MAP = {
    "project": "project_key",
    "key": "key",
    "issuekey": "key",
    "issue": "key",
    "status": "status.name",
    "statuscategory": "status.category",
    "type": "issuetype",
    "issuetype": "issuetype",
    "priority": "priority",
    "assignee": "assignee.name",
    "reporter": "reporter.name",
    "summary": "summary",
    "description": "description",
    "created": "created",
    "updated": "updated",
    "epic link": "epic_link",
    "parent": "parent_issue",
    "labels": "custom_fields",  # unused; placeholder
}

_DATE_FIELDS = {"created", "updated"}


class JQLError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<cf>cf\[\d+\])
  | (?P<op><=|>=|!=|=|<|>|~)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<reldate>-\d+[dwh]\b)
  | (?P<word>[A-Za-z_][A-Za-z0-9_.@-]*)
  | (?P<number>\d+(?:\.\d+)?)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise JQLError(f"unexpected character at {i}: {s[i:i + 10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Tok(kind, m.group()))
    return out


# ---------------------------------------------------------------------------
# Validation lint (F9)
# ---------------------------------------------------------------------------

def _quotes_balanced(s: str) -> bool:
    """Escape-aware quote scanner (mirrors areQuotesBalanced,
    pkg/jql/builder.go:292-321)."""
    in_q: str | None = None
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and in_q:
            i += 2
            continue
        if in_q:
            if c == in_q:
                in_q = None
        elif c in "\"'":
            in_q = c
        i += 1
    return in_q is None


def validate(jql: str) -> list[str]:
    errors = []
    if not jql or not jql.strip():
        errors.append("empty query")
        return errors
    if not _quotes_balanced(jql):
        errors.append("unbalanced quotes")
    # paren depth tracked OUTSIDE quoted regions only (escape-aware, same
    # scanner discipline as _quotes_balanced): `summary ~ ":-)"` is valid —
    # the reference's raw count-based check shares this false positive
    # (pkg/jql/builder.go:267-290); we fix it rather than port it
    depth = 0
    in_q: str | None = None
    i = 0
    while i < len(jql):
        c = jql[i]
        if c == "\\" and in_q:
            i += 2
            continue
        if in_q:
            if c == in_q:
                in_q = None
        elif c in "\"'":
            in_q = c
        else:
            depth += c == "("
            depth -= c == ")"
            if depth < 0:
                errors.append("unbalanced parentheses")
                break
        i += 1
    if depth > 0:
        errors.append("unbalanced parentheses")
    if re.search(r"\b(AND\s+AND|OR\s+OR)\b", jql, re.IGNORECASE):
        errors.append("duplicated boolean operator")
    return errors


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Cmp:
    fld: str
    op: str
    value: object  # str | float | ("func", name, arg) | ("reldate", text)


@dataclass
class InList:
    fld: str
    values: list
    negated: bool = False


@dataclass
class Membership:  # field in issuesInEpic(K) / linkedIssues(K) / openSprints()
    fld: str
    func: str
    arg: str | None
    negated: bool = False


@dataclass
class Empty:
    fld: str
    negated: bool


@dataclass
class History:
    """JQL history operators (Atlassian JQL WAS / CHANGED — the changelog
    surface). `values` holds the WAS right-hand side (1 value, or the
    WAS IN list); CHANGED uses the from/to qualifiers instead. after/
    before/by are the shared time/author qualifiers; each is a plain
    value or a ("reldate", text) tuple resolved against ctx.now."""

    fld: str
    mode: str  # "was" | "changed"
    values: list | None = None
    negated: bool = False
    from_value: object | None = None
    to_value: object | None = None
    by: object | None = None
    after: object | None = None
    before: object | None = None
    during: tuple | None = None  # (d1, d2): interval-overlap qualifier


@dataclass
class Not:
    child: object


@dataclass
class Bool:
    op: str  # "AND" | "OR"
    children: list


@dataclass
class Query:
    where: object | None
    order_by: list[tuple[str, str]] = field(default_factory=list)


_FUNCS = {"currentuser", "opensprints", "issuesinepic", "linkedissues"}
# JQL date functions (value position): truncate ctx.now, then apply the
# optional "-Nd"/"-Nw"/"-Nh" offset argument — startOfDay("-1d") is the
# start of yesterday. Week boundary = Monday 00:00 (ISO; JIRA's default
# is locale-dependent — documented choice).
_DATE_FUNCS = {"startofday", "endofday", "startofweek", "endofweek"}
_FUNCS = _FUNCS | _DATE_FUNCS


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise JQLError("unexpected end of query")
        self.i += 1
        return t

    def accept_word(self, *words: str) -> bool:
        t = self.peek()
        if t and t.kind == "word" and t.text.upper() in words:
            self.i += 1
            return True
        return False

    def parse(self) -> Query:
        where = None
        if self.peek() and not self._at_order_by():
            where = self.or_expr()
        order = []
        if self._at_order_by():
            self.i += 2
            while True:
                fld = self._field_name()
                direction = "ASC"
                if self.accept_word("ASC"):
                    direction = "ASC"
                elif self.accept_word("DESC"):
                    direction = "DESC"
                order.append((fld, direction))
                t = self.peek()
                if t and t.kind == "comma":
                    self.i += 1
                    continue
                break
        if self.peek() is not None:
            raise JQLError(f"trailing tokens at {self.peek().text!r}")
        return Query(where, order)

    def _at_order_by(self) -> bool:
        t = self.peek()
        t2 = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        return bool(
            t and t.kind == "word" and t.text.upper() == "ORDER"
            and t2 and t2.kind == "word" and t2.text.upper() == "BY"
        )

    def or_expr(self):
        left = self.and_expr()
        children = [left]
        while self.accept_word("OR"):
            children.append(self.and_expr())
        return children[0] if len(children) == 1 else Bool("OR", children)

    def and_expr(self):
        children = [self.not_expr()]
        while self.accept_word("AND"):
            children.append(self.not_expr())
        return children[0] if len(children) == 1 else Bool("AND", children)

    def not_expr(self):
        if self.accept_word("NOT"):
            return Not(self.not_expr())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t and t.kind == "lparen":
            self.i += 1
            inner = self.or_expr()
            if self.next().kind != "rparen":
                raise JQLError("expected )")
            return inner
        return self.comparison()

    def _field_name(self) -> str:
        t = self.next()
        if t.kind == "string":
            return t.text[1:-1].lower()
        if t.kind == "cf":
            return t.text.lower()  # cf[12311140]
        if t.kind == "word":
            return t.text.lower()
        raise JQLError(f"expected field name, got {t.text!r}")

    def comparison(self):
        fld = self._field_name()
        t = self.peek()
        if t is None:
            raise JQLError(f"dangling field {fld!r}")
        # IS [NOT] EMPTY
        if t.kind == "word" and t.text.upper() == "IS":
            self.i += 1
            negated = self.accept_word("NOT")
            if not self.accept_word("EMPTY", "NULL"):
                raise JQLError("expected EMPTY after IS")
            return Empty(fld, negated)
        # history operators: WAS [NOT] [IN] ... / CHANGED [FROM|TO ...]
        if t.kind == "word" and t.text.upper() == "WAS":
            self.i += 1
            return self._was_rhs(fld)
        if t.kind == "word" and t.text.upper() == "CHANGED":
            self.i += 1
            return self._changed_rhs(fld)
        # [NOT] IN
        negated = False
        if t.kind == "word" and t.text.upper() == "NOT":
            self.i += 1
            negated = True
            t = self.peek()
        if t and t.kind == "word" and t.text.upper() == "IN":
            self.i += 1
            return self._in_rhs(fld, negated)
        if negated:
            raise JQLError("NOT must be followed by IN here")
        # binary op
        op_t = self.next()
        if op_t.kind != "op":
            raise JQLError(f"expected operator after {fld!r}, got {op_t.text!r}")
        return Cmp(fld, op_t.text, self._value())

    def _in_rhs(self, fld: str, negated: bool):
        t = self.next()
        if t.kind != "lparen":
            raise JQLError("expected ( after IN")
        # function membership: IN (issuesInEpic("K")) or IN (openSprints())
        t = self.peek()
        if t and t.kind == "word" and t.text.lower() in _FUNCS:
            m = self._function()
            if self.next().kind != "rparen":
                raise JQLError("expected ) closing IN")
            return Membership(fld, m[1], m[2], negated)
        values = [self._value()]
        while self.peek() and self.peek().kind == "comma":
            self.i += 1
            values.append(self._value())
        if self.next().kind != "rparen":
            raise JQLError("expected ) closing IN list")
        return InList(fld, values, negated)

    _HIST_QUALS = ("BY", "AFTER", "BEFORE", "DURING")

    def _hist_quals(self, h: "History") -> None:
        """Zero or more BY/AFTER/BEFORE/DURING qualifiers, each at most
        once; DURING takes a parenthesized (d1, d2) pair."""
        while True:
            t = self.peek()
            if not (t and t.kind == "word" and t.text.upper() in self._HIST_QUALS):
                return
            name = self.next().text.lower()
            if getattr(h, name) is not None:
                raise JQLError(f"duplicate {name.upper()} qualifier")
            if name == "during":
                if self.next().kind != "lparen":
                    raise JQLError("expected ( after DURING")
                d1 = self._value()
                if self.next().kind != "comma":
                    raise JQLError("expected , in DURING (d1, d2)")
                d2 = self._value()
                if self.next().kind != "rparen":
                    raise JQLError("expected ) closing DURING")
                h.during = (d1, d2)
            else:
                setattr(h, name, self._value())

    def _was_rhs(self, fld: str) -> "History":
        h = History(fld, "was")
        h.negated = self.accept_word("NOT")
        if self.accept_word("IN"):
            t = self.next()
            if t.kind != "lparen":
                raise JQLError("expected ( after WAS IN")
            h.values = [self._value()]
            while self.peek() and self.peek().kind == "comma":
                self.i += 1
                h.values.append(self._value())
            if self.next().kind != "rparen":
                raise JQLError("expected ) closing WAS IN list")
        else:
            h.values = [self._value()]
        self._hist_quals(h)
        return h

    def _changed_rhs(self, fld: str) -> "History":
        h = History(fld, "changed")
        while True:
            t = self.peek()
            if t and t.kind == "word" and t.text.upper() == "FROM":
                self.i += 1
                if h.from_value is not None:
                    raise JQLError("duplicate FROM qualifier")
                h.from_value = self._value()
            elif t and t.kind == "word" and t.text.upper() == "TO":
                self.i += 1
                if h.to_value is not None:
                    raise JQLError("duplicate TO qualifier")
                h.to_value = self._value()
            elif t and t.kind == "word" and t.text.upper() in self._HIST_QUALS:
                self._hist_quals(h)
            else:
                return h

    def _function(self):
        name = self.next().text.lower()
        if self.next().kind != "lparen":
            raise JQLError(f"expected ( after function {name}")
        arg = None
        t = self.peek()
        if t and t.kind in ("string", "word", "number"):
            arg = self.next().text
            if arg[0] in "\"'":
                arg = arg[1:-1]
        if self.next().kind != "rparen":
            raise JQLError(f"expected ) closing {name}()")
        return ("func", name, arg)

    def _value(self):
        t = self.next()
        if t.kind == "string":
            return t.text[1:-1].replace('\\"', '"').replace("\\'", "'")
        if t.kind == "number":
            return float(t.text)
        if t.kind == "reldate":
            return ("reldate", t.text)
        if t.kind == "word":
            if t.text.lower() in _FUNCS:
                self.i -= 1
                return self._function()
            return t.text
        raise JQLError(f"unexpected value token {t.text!r}")


def _or_to_in(node):
    """U5 — OR→IN consolidation (the reference only SUGGESTS this rewrite,
    pkg/jql/builder.go:332-334, at ≥3 ORs; we APPLY it): ≥3 equality
    comparisons on the same field under one OR collapse to an IN-list,
    which Catalyst then pushes down as a single In predicate. Recursive
    over the AST; non-equality siblings are preserved."""
    if isinstance(node, Not):
        return Not(_or_to_in(node.child))
    if not isinstance(node, Bool):
        return node
    children = [_or_to_in(c) for c in node.children]
    if node.op != "OR":
        return Bool(node.op, children)
    eq_by_field: dict[str, list] = {}
    for c in children:
        if isinstance(c, Cmp) and c.op == "=" and not isinstance(c.value, tuple):
            eq_by_field.setdefault(c.fld, []).append(c)
    rewritten: list = []
    consumed: set[int] = set()
    for fld, cmps in eq_by_field.items():
        if len(cmps) >= 3:
            rewritten.append(InList(fld, [c.value for c in cmps]))
            consumed.update(id(c) for c in cmps)
    rest = [c for c in children if id(c) not in consumed]
    out = rewritten + rest
    return out[0] if len(out) == 1 else Bool("OR", out)


def parse(jql: str) -> Query:
    errs = validate(jql)
    if errs:
        raise JQLError("; ".join(errs))
    q = _Parser(tokenize(jql)).parse()
    if q.where is not None:
        q.where = _or_to_in(q.where)
    return q


# ---------------------------------------------------------------------------
# Emitter + OptimizeQuery (§4.1 — pkg/jql/jira_builder.go:195-234)
# ---------------------------------------------------------------------------

_FUNC_CASE = {
    "currentuser": "currentUser",
    "opensprints": "openSprints",
    "issuesinepic": "issuesInEpic",
    "linkedissues": "linkedIssues",
    "startofday": "startOfDay",
    "endofday": "endOfDay",
    "startofweek": "startOfWeek",
    "endofweek": "endOfWeek",
}

# a value may be emitted bare ONLY if the lexer re-reads it as one `word`
# token: word-shaped (no leading digit — digits lex as numbers), not a
# keyword, not a function name
_BARE_VALUE_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.@-]*$")
_RESERVED = {
    "AND", "OR", "NOT", "IN", "IS", "ORDER", "BY", "EMPTY", "NULL",
    "WAS", "CHANGED", "FROM", "TO", "AFTER", "BEFORE", "DURING",
}


def _emit_value(v) -> str:
    if isinstance(v, tuple):
        if v[0] == "reldate":
            return v[1]
        name = _FUNC_CASE[v[1]]
        return f'{name}("{v[2]}")' if v[2] is not None else f"{name}()"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else str(v)
    if (
        _BARE_VALUE_RE.match(v)
        and v.upper() not in _RESERVED
        and v.lower() not in _FUNCS
    ):
        return v
    return '"' + v.replace('"', '\\"') + '"'


def _emit_field(fld: str) -> str:
    return f'"{fld}"' if " " in fld else fld


def _emit(node) -> str:
    if isinstance(node, Bool):
        parts = [
            f"({_emit(c)})" if isinstance(c, Bool) else _emit(c)
            for c in node.children
        ]
        return f" {node.op} ".join(parts)
    if isinstance(node, Not):
        inner = _emit(node.child)
        return f"NOT ({inner})" if isinstance(node.child, Bool) else f"NOT {inner}"
    if isinstance(node, Empty):
        return f"{_emit_field(node.fld)} IS {'NOT ' if node.negated else ''}EMPTY"
    if isinstance(node, InList):
        vals = ", ".join(_emit_value(v) for v in node.values)
        kw = "NOT IN" if node.negated else "IN"
        return f"{_emit_field(node.fld)} {kw} ({vals})"
    if isinstance(node, Membership):
        name = _FUNC_CASE[node.func]
        arg = f'"{node.arg}"' if node.arg is not None else ""
        kw = "NOT IN" if node.negated else "IN"
        return f"{_emit_field(node.fld)} {kw} ({name}({arg}))"
    if isinstance(node, Cmp):
        return f"{_emit_field(node.fld)} {node.op} {_emit_value(node.value)}"
    if isinstance(node, History):
        parts = [_emit_field(node.fld)]
        if node.mode == "was":
            parts.append("WAS")
            if node.negated:
                parts.append("NOT")
            if len(node.values) > 1:
                parts.append(
                    "IN (" + ", ".join(_emit_value(v) for v in node.values) + ")"
                )
            else:
                parts.append(_emit_value(node.values[0]))
        else:
            parts.append("CHANGED")
            if node.from_value is not None:
                parts.append(f"FROM {_emit_value(node.from_value)}")
            if node.to_value is not None:
                parts.append(f"TO {_emit_value(node.to_value)}")
        if node.by is not None:
            parts.append(f"BY {_emit_value(node.by)}")
        if node.after is not None:
            parts.append(f"AFTER {_emit_value(node.after)}")
        if node.before is not None:
            parts.append(f"BEFORE {_emit_value(node.before)}")
        if node.during is not None:
            parts.append(
                f"DURING ({_emit_value(node.during[0])},"
                f" {_emit_value(node.during[1])})"
            )
        return " ".join(parts)
    raise JQLError(f"cannot emit {node!r}")


def emit(q: Query) -> str:
    """Serialize an AST back to JQL (round-trips through parse())."""
    parts = []
    if q.where is not None:
        parts.append(_emit(q.where))
    if q.order_by:
        parts.append(
            "ORDER BY " + ", ".join(f"{_emit_field(f)} {d}" for f, d in q.order_by)
        )
    return " ".join(parts)


def optimize_query(jql: str) -> tuple[str, list[str]]:
    """OptimizeQuery parity (pkg/jql/jira_builder.go:195-234): move a
    top-level `project =` conjunct to the front (the reference's
    hand-rolled selectivity heuristic — a no-op for Catalyst's pushdown,
    kept so emitted JQL matches the reference's), append a deterministic
    `ORDER BY key ASC` when the query has no sort (jira_builder.go:
    222-225), and report the rewrites. OR→IN consolidation (which
    builder.go:332-334 merely suggests at >= 3 ORs) is APPLIED by our
    parser; when it fires, the note records it. Idempotent."""
    q = parse(jql)
    notes: list[str] = []
    if isinstance(q.where, Bool) and q.where.op == "AND":
        proj = [
            c
            for c in q.where.children
            if isinstance(c, Cmp) and c.fld == "project" and c.op == "="
        ]
        if proj and q.where.children[0] is not proj[0]:
            rest = [c for c in q.where.children if c is not proj[0]]
            q.where.children = [proj[0], *rest]
            notes.append("moved project filter first")
    if not q.order_by:
        q.order_by = [("key", "ASC")]
        notes.append("appended ORDER BY key ASC")
    out = emit(q)
    if len(re.findall(r"\bOR\b", jql, re.IGNORECASE)) >= 2 and re.search(
        r"\bIN \(", out
    ) and not re.search(r"\bIN\s*\(", jql, re.IGNORECASE):
        notes.append("consolidated OR chain into IN")
    return out, notes


# ---------------------------------------------------------------------------
# Compiler: AST → DataFrame transformation
# ---------------------------------------------------------------------------

@dataclass
class JQLContext:
    """Compile-time bindings for session functions and subqueries.

    issues/links: frames backing issuesInEpic()/linkedIssues() membership.
    now: the reference timestamp for relative dates (P13) — explicit so
    results are deterministic/oracle-checkable (the reference implicitly
    uses the JIRA server's clock).
    open_sprint_member: boolean Column over issues standing in for
    `sprint in openSprints()` (the reference delegates sprint state to the
    server; we bind it to a dimension predicate).
    """

    issues: DataFrame | None = None
    links: DataFrame | None = None
    current_user: str | None = None
    now: datetime | None = None
    open_sprint_member: Column | None = None
    # (key, field, from_value, to_value, changed_at, author) — the JIRA
    # changelog.histories surface backing WAS / CHANGED (fixtures.changelog)
    changelog: DataFrame | None = None


_REL_UNITS = {"d": "days", "w": "weeks", "h": "hours"}

_OFFSET_RE = re.compile(r"^([+-]?\d+)([dwh])$")


def _resolve_date_func(name: str, arg: str | None, ctx: "JQLContext") -> datetime:
    """startOfDay/endOfDay/startOfWeek/endOfWeek against ctx.now:
    truncate, apply the optional offset, and for end* add the period
    minus one second (JIRA's inclusive end-of-period)."""
    if ctx.now is None:
        raise JQLError(f"{_FUNC_CASE[name]}() used without ctx.now")
    base = ctx.now.replace(hour=0, minute=0, second=0, microsecond=0)
    if name.endswith("ofweek"):
        base = base - timedelta(days=base.weekday())  # Monday 00:00
    if name.startswith("endof"):
        period = timedelta(days=7 if name.endswith("ofweek") else 1)
        base = base + period - timedelta(seconds=1)
    if arg:
        m = _OFFSET_RE.match(arg)
        if not m:
            raise JQLError(f"bad offset {arg!r} for {_FUNC_CASE[name]}()")
        base = base + timedelta(**{_REL_UNITS[m.group(2)]: int(m.group(1))})
    return base


def _col(fld: str) -> Column:
    if fld.startswith("cf["):
        num = fld[3:-1]
        return F.col("custom_fields").getItem(f"customfield_{num}")
    mapped = FIELD_MAP.get(fld)
    if mapped is None:
        raise JQLError(f"unknown field {fld!r}")
    return F.col(mapped)


def _scalar(value, fld: str, ctx: JQLContext) -> Column:
    if isinstance(value, tuple) and value[0] == "reldate":
        if ctx.now is None:
            raise JQLError("relative date used without ctx.now")
        n = int(value[1][1:-1])
        unit = _REL_UNITS[value[1][-1]]
        return F.lit(ctx.now - timedelta(**{unit: n}))
    if isinstance(value, tuple) and value[0] == "func":
        if value[1] == "currentuser":
            if ctx.current_user is None:
                raise JQLError("currentUser() used without ctx.current_user")
            return F.lit(ctx.current_user)
        if value[1] in _DATE_FUNCS:
            return F.lit(_resolve_date_func(value[1], value[2], ctx))
        raise JQLError(f"function {value[1]}() not valid as scalar here")
    return F.lit(value)


class Plan:
    """Compiled query: apply(df) → filtered+sorted DataFrame.

    Membership terms become LEFT-join marker columns (composable under
    OR/NOT), added once up front; the boolean expression then references
    coalesce(marker, false); markers are dropped on output.
    """

    def __init__(self, q: Query, ctx: JQLContext):
        self.q = q
        self.ctx = ctx
        self._markers: list[tuple[str, Membership]] = []
        self._collect_memberships(q.where)

    def _collect_memberships(self, node) -> None:
        if isinstance(node, Membership) and node.func in ("issuesinepic", "linkedissues"):
            self._markers.append((f"__jql_m{len(self._markers)}", node))
        elif isinstance(node, History):
            self._markers.append((f"__jql_m{len(self._markers)}", node))
        elif isinstance(node, Bool):
            for c in node.children:
                self._collect_memberships(c)
        elif isinstance(node, Not):
            self._collect_memberships(node.child)

    def _hist_time(self, v) -> Column:
        """AFTER/BEFORE qualifier value → timestamp Column (plain literal
        or a -Nd/-Nw/-Nh relative date against ctx.now)."""
        if isinstance(v, tuple) and v[0] == "reldate":
            if self.ctx.now is None:
                raise JQLError("relative date used without ctx.now")
            n = int(v[1][1:-1])
            unit = _REL_UNITS[v[1][-1]]
            return F.lit(self.ctx.now - timedelta(**{unit: n}))
        return F.lit(v).cast("timestamp")

    def _member_set_history(self, h: History) -> DataFrame:
        """Issue-key member set for a WAS / CHANGED term over the
        changelog. The changelog's creation rows make the value timeline
        self-contained: the value held during [changed_at, lead(changed_at))
        is to_value, so
          WAS v            ⟺ ∃ row: to_value = v
          WAS v AFTER d    ⟺ ∃ row: to_value = v ∧ interval end > d
          WAS v BEFORE d   ⟺ ∃ row: to_value = v ∧ changed_at < d
          WAS v DURING (a,b) ⟺ interval overlaps [a,b]: start <= b ∧ end > a
          CHANGED …        ⟺ ∃ NON-creation row matching FROM/TO/BY/time
                             (DURING: a <= changed_at <= b).
        The only window (the AFTER interval-end lead) partitions by
        (key, field) — bounded per-issue groups, never global."""
        if self.ctx.changelog is None:
            raise JQLError("WAS/CHANGED needs ctx.changelog")
        cl = self.ctx.changelog.filter(F.col("field") == h.fld)
        if h.mode == "was":
            if h.after is not None or h.during is not None:
                from pyspark.sql import Window

                w = Window.partitionBy("key", "field").orderBy("changed_at")
                cl = cl.withColumn("__end", F.lead("changed_at").over(w))
            eqs = [
                F.col("to_value") == _scalar(v, h.fld, self.ctx)
                for v in h.values
            ]
            cond = eqs[0]
            for e in eqs[1:]:
                cond = cond | e
            if h.after is not None:
                cond &= F.col("__end").isNull() | (
                    F.col("__end") > self._hist_time(h.after)
                )
            if h.during is not None:
                d1, d2 = h.during
                cond &= F.col("changed_at") <= self._hist_time(d2)
                cond &= F.col("__end").isNull() | (
                    F.col("__end") > self._hist_time(d1)
                )
        else:
            cond = F.col("from_value").isNotNull()
            if h.from_value is not None:
                cond &= F.col("from_value") == _scalar(
                    h.from_value, h.fld, self.ctx
                )
            if h.to_value is not None:
                cond &= F.col("to_value") == _scalar(h.to_value, h.fld, self.ctx)
            if h.after is not None:
                cond &= F.col("changed_at") > self._hist_time(h.after)
            if h.during is not None:
                d1, d2 = h.during
                cond &= F.col("changed_at") >= self._hist_time(d1)
                cond &= F.col("changed_at") <= self._hist_time(d2)
        if h.by is not None:
            cond &= F.col("author") == _scalar(h.by, h.fld, self.ctx)
        if h.before is not None:
            cond &= F.col("changed_at") < self._hist_time(h.before)
        return cl.filter(cond).select(F.col("key").alias("__jql_k")).distinct()

    def _member_set(self, m: Membership) -> DataFrame:
        if m.func == "issuesinepic":
            if self.ctx.issues is None:
                raise JQLError("issuesInEpic() needs ctx.issues")
            return (
                self.ctx.issues.filter(F.col("epic_link") == m.arg)
                .select(F.col("key").alias("__jql_k"))
                .distinct()
            )
        if self.ctx.links is None:
            raise JQLError("linkedIssues() needs ctx.links")
        return (
            self.ctx.links.filter(F.col("src_key") == m.arg)
            .select(F.col("dst_key").alias("__jql_k"))
            .distinct()
        )

    def _predicate(self, node, markers: dict[int, str]) -> Column:
        if isinstance(node, Bool):
            cols = [self._predicate(c, markers) for c in node.children]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if node.op == "AND" else (out | c)
            return out
        if isinstance(node, Not):
            return ~self._predicate(node.child, markers)
        if isinstance(node, Empty):
            c = _col(node.fld)
            return c.isNotNull() if node.negated else c.isNull()
        if isinstance(node, InList):
            c = _col(node.fld).isin(*[v for v in node.values])
            return ~c if node.negated else c
        if isinstance(node, Membership):
            if node.func == "opensprints":
                if self.ctx.open_sprint_member is None:
                    raise JQLError("openSprints() needs ctx.open_sprint_member")
                c = self.ctx.open_sprint_member
            else:
                c = F.coalesce(F.col(markers[id(node)]), F.lit(False))
            return ~c if node.negated else c
        if isinstance(node, History):
            c = F.coalesce(F.col(markers[id(node)]), F.lit(False))
            return ~c if node.negated else c
        if isinstance(node, Cmp):
            lhs = _col(node.fld)
            rhs = _scalar(node.value, node.fld, self.ctx)
            op = node.op
            if op == "=":
                return lhs == rhs
            if op == "!=":
                return lhs != rhs
            if op == "~":
                return lhs.contains(rhs)
            if op == ">":
                return lhs > rhs
            if op == ">=":
                return lhs >= rhs
            if op == "<":
                return lhs < rhs
            return lhs <= rhs
        raise JQLError(f"unsupported node {node!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        marker_names = {}
        for name, m in self._markers:
            if isinstance(m, History):
                # history member sets are ISSUE-KEY sets (the changelog is
                # keyed by issue), joined on the issue key — and NOT
                # broadcast unconditionally: at scale the set is corpus-
                # sized (changelog ≈ issues), so AQE picks the strategy
                members = self._member_set_history(m).withColumn(
                    name, F.lit(True)
                )
                out = out.join(
                    members, F.col("key") == F.col("__jql_k"), "left"
                ).drop("__jql_k")
            else:
                members = self._member_set(m).withColumn(name, F.lit(True))
                out = out.join(
                    F.broadcast(members),
                    _col(m.fld) == F.col("__jql_k"),
                    "left",
                ).drop("__jql_k")
            marker_names[id(m)] = name
        if self.q.where is not None:
            out = out.filter(self._predicate(self.q.where, marker_names))
        out = out.drop(*[n for n, _ in self._markers])
        if self.q.order_by:
            sort_cols = [
                _col(f).asc() if d == "ASC" else _col(f).desc()
                for f, d in self.q.order_by
            ]
            out = out.orderBy(*sort_cols)
        return out


def compile_jql(jql: str, ctx: JQLContext | None = None) -> Plan:
    return Plan(parse(jql), ctx or JQLContext())


def run_jql(jql: str, df: DataFrame, ctx: JQLContext | None = None) -> DataFrame:
    return compile_jql(jql, ctx).apply(df)


# ---------------------------------------------------------------------------
# Builtin templates (P18 — pkg/jql/builder.go:126-246; profile templates
# pkg/profile/templates.go:10-)
# ---------------------------------------------------------------------------

TEMPLATES: dict[str, dict] = {
    "epic-all-issues": {
        "jql": '"Epic Link" = {epic} OR parent IN (issuesInEpic("{epic}")) ORDER BY key ASC',
        "required": ["epic"],
        "defaults": {},
    },
    "epic-stories-only": {
        "jql": '"Epic Link" = {epic} AND type = Story ORDER BY key ASC',
        "required": ["epic"],
        "defaults": {},
    },
    "project-all-issues": {
        "jql": "project = {project} ORDER BY key ASC",
        "required": ["project"],
        "defaults": {},
    },
    "project-active-issues": {
        "jql": 'project = {project} AND status NOT IN ("Closed", "Done") ORDER BY key ASC',
        "required": ["project"],
        "defaults": {},
    },
    "recent-updates": {
        "jql": "project = {project} AND updated >= -{days}d ORDER BY updated DESC",
        "required": ["project"],
        "defaults": {"days": "7"},
    },
    "my-current-sprint": {
        "jql": "assignee = currentUser() AND sprint IN (openSprints()) ORDER BY key ASC",
        "required": [],
        "defaults": {},
    },
}


def build_from_template(name: str, params: dict[str, str] | None = None) -> str:
    """Instantiate a builtin JQL template (BuildFromTemplate,
    pkg/jql/jira_builder.go:95-162): required-param check, defaults, then
    substitution; the result is validated before return."""
    tpl = TEMPLATES.get(name)
    if tpl is None:
        raise JQLError(f"unknown template {name!r}")
    params = dict(params or {})
    for p in tpl["required"]:
        if p not in params:
            raise JQLError(f"template {name!r} missing required param {p!r}")
    merged = {**tpl["defaults"], **params}
    try:
        jql = tpl["jql"].format(**merged)
    except KeyError as e:
        raise JQLError(f"template {name!r} missing param {e}") from None
    errs = validate(jql)
    if errs:
        raise JQLError(f"template produced invalid JQL: {'; '.join(errs)}")
    return jql
