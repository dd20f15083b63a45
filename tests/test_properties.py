"""Property-based tests (hypothesis) — parser-level, no JVM needed.

Mirrors the reference's table-driven fuzz posture for JQL validation
(pkg/jql/builder.go:267-321 validates arbitrary user JQL) with generated
inputs instead of hand-picked cases.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from jira_cdc_git_spark import jql as J

# identifiers that are real JQL fields in our FIELD_MAP
FIELDS = ["project", "status", "priority", "assignee", "type", "key"]

ident = st.text(alphabet=string.ascii_uppercase, min_size=1, max_size=8)
value = st.text(
    alphabet=string.ascii_letters + string.digits + " _-", min_size=1, max_size=12
).map(lambda s: '"' + s.strip() + '"').filter(lambda s: len(s) > 2)


@st.composite
def comparison(draw):
    fld = draw(st.sampled_from(FIELDS))
    op = draw(st.sampled_from(["=", "!=", "~", ">", ">=", "<", "<="]))
    val = draw(value)
    return f"{fld} {op} {val}"


@st.composite
def jql_expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(comparison())
    left = draw(jql_expr(depth=depth + 1))
    right = draw(jql_expr(depth=depth + 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    wrapped = draw(st.booleans())
    expr = f"{left} {op} {right}"
    return f"({expr})" if wrapped else expr


@given(jql_expr())
@settings(max_examples=200, deadline=None)
def test_generated_jql_always_parses(expr):
    q = J.parse(expr)
    assert q.where is not None


@given(jql_expr())
@settings(max_examples=100, deadline=None)
def test_unbalanced_paren_always_rejected(expr):
    errs = J.validate("(" + expr)
    assert any("paren" in e for e in errs)


@given(jql_expr())
@settings(max_examples=100, deadline=None)
def test_trailing_quote_always_rejected(expr):
    errs = J.validate(expr + ' "')
    assert any("quote" in e for e in errs)


@given(st.sampled_from(FIELDS), st.lists(value, min_size=3, max_size=6, unique=True))
@settings(max_examples=100, deadline=None)
def test_or_chain_of_equalities_collapses_to_in(fld, vals):
    # U5: >= 3 same-field equalities under one OR become a single IN-list
    expr = " OR ".join(f"{fld} = {v}" for v in vals)
    q = J.parse(expr)
    assert isinstance(q.where, J.InList)
    assert sorted(q.where.values) == sorted(v.strip('"') for v in vals)


@given(
    st.sampled_from(FIELDS),
    st.lists(value, min_size=3, max_size=4, unique=True),
    comparison(),
)
@settings(max_examples=100, deadline=None)
def test_or_to_in_preserves_non_equality_siblings(fld, vals, other):
    expr = " OR ".join(f"{fld} = {v}" for v in vals) + f" OR {other}"
    q = J.parse(expr)
    # the rewrite must keep the non-equality comparison as an OR sibling
    # (unless `other` is itself an equality on the same field, in which
    # case it may have been absorbed into the IN-list)
    other_fld, other_op = other.split()[0], other.split()[1]
    if other_op == "=" and other_fld == fld:
        assert isinstance(q.where, (J.InList, J.Bool))
    else:
        assert isinstance(q.where, J.Bool) and q.where.op == "OR"
        assert any(isinstance(c, J.InList) for c in q.where.children)
        assert any(isinstance(c, J.Cmp) for c in q.where.children)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_parser_total_on_arbitrary_input(s):
    # parse() either succeeds or raises JQLError — never any other exception
    try:
        J.parse(s)
    except J.JQLError:
        pass


@given(st.lists(st.tuples(st.sampled_from(FIELDS), st.sampled_from(["ASC", "DESC", "asc", "desc"])),
                min_size=1, max_size=3))
@settings(max_examples=50, deadline=None)
def test_order_by_roundtrip(keys):
    expr = 'project = "X" ORDER BY ' + ", ".join(f"{f} {d}" for f, d in keys)
    q = J.parse(expr)
    assert [(f, d.lower()) for f, d in q.order_by] == [
        (f, d.lower()) for f, d in keys
    ]


@given(jql_expr())
@settings(max_examples=200, deadline=None)
def test_emit_parse_fixpoint(expr):
    # emit is a right inverse of parse: parse(emit(q)) == q, and the emitted
    # string is a fixpoint (emit(parse(emit(q))) == emit(q))
    q = J.parse(expr)
    out = J.emit(q)
    assert J.parse(out) == q
    assert J.emit(J.parse(out)) == out


@given(jql_expr())
@settings(max_examples=100, deadline=None)
def test_optimize_query_idempotent_and_parseable(expr):
    out1, _ = J.optimize_query(expr)
    out2, notes2 = J.optimize_query(out1)
    assert out1 == out2 and notes2 == []
    assert J.parse(out1).order_by  # deterministic sort always present


# ---------------------------------------------------------------------------
# BPE greedy merge pass (the r5 linear rewrite) vs the fold reference
# ---------------------------------------------------------------------------

def _fold_merge(syms, left, right, merged):
    """The original O(n²) accumulate-fold semantics (r4 text.py rewrite
    expression), kept here as the executable spec: push each symbol; if
    the last pushed equals `left` and the next is `right`, pop+push the
    merged symbol."""
    acc = []
    for t in syms:
        if acc and acc[-1] == left and t == right:
            acc[-1] = merged
        else:
            acc.append(t)
    return acc


@given(
    st.lists(st.sampled_from("ab"), max_size=40),
    st.sampled_from(["a", "b"]),
    st.sampled_from(["a", "b"]),
)
@settings(max_examples=200, deadline=None)
def test_merge_pass_matches_fold_spec(syms, left, right):
    from jira_cdc_git_spark.operators.text import BPE_SEP, _merge_pass

    merged = left + BPE_SEP + right
    got = _merge_pass(syms, left, right, merged)
    assert got == _fold_merge(syms, left, right, merged)
    # no adjacent (left, right) pair survives a pass
    assert all(
        not (x == left and y == right) for x, y in zip(got, got[1:])
    )
    # token mass is conserved: every merge removes exactly one slot
    n_merges = sum(1 for s in got if s == merged) - syms.count(merged)
    assert len(got) == len(syms) - n_merges
