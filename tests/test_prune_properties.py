"""Property-based soundness of manifest bounds pruning: pruning may keep
too much, but must NEVER drop a file containing a matching row.  Pure
Python (no Spark) — hypothesis drives random predicates and file bounds."""

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_ruby_spark.table import _bounds_may_match, _parse_predicate

OPS = ["=", "<", "<=", ">", ">=", "!="]


def leaf(col: str, op: str, val: int) -> str:
    return f"{col} {op} {val}"


@st.composite
def predicates(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        col = draw(st.sampled_from(["a", "b"]))
        op = draw(st.sampled_from(OPS))
        val = draw(st.integers(-20, 20))
        return leaf(col, op, val)
    lhs = draw(predicates(depth=depth - 1))
    rhs = draw(predicates(depth=depth - 1))
    junction = draw(st.sampled_from(["AND", "OR"]))
    return f"({lhs}) {junction} ({rhs})"


def eval_row(pred: str, row: dict) -> bool:
    safe = pred.replace("AND", "and").replace("OR", "or").replace("=", "==")
    safe = safe.replace("<==", "<=").replace(">==", ">=").replace("!==", "!=")
    return bool(eval(safe, {}, dict(row)))


@settings(max_examples=300, deadline=None)
@given(
    pred=predicates(),
    a_lo=st.integers(-15, 15),
    a_len=st.integers(0, 10),
    b_lo=st.integers(-15, 15),
    b_len=st.integers(0, 10),
)
def test_pruning_never_drops_matching_rows(pred, a_lo, a_len, b_lo, b_len):
    tree = _parse_predicate(pred)
    assert tree is not None, pred  # the generator stays inside the grammar
    a_hi, b_hi = a_lo + a_len, b_lo + b_len
    entry = {
        "lower-bounds": {"a": a_lo, "b": b_lo},
        "upper-bounds": {"a": a_hi, "b": b_hi},
    }
    if _bounds_may_match(entry, tree):
        return  # kept — always sound
    # pruned: NO (a, b) inside the bounds box may satisfy the predicate
    for a in range(a_lo, a_hi + 1):
        for b in range(b_lo, b_hi + 1):
            assert not eval_row(pred, {"a": a, "b": b}), (
                pred,
                entry,
                {"a": a, "b": b},
            )


@settings(max_examples=100, deadline=None)
@given(pred=predicates())
def test_parser_accepts_generated_grammar(pred):
    assert _parse_predicate(pred) is not None


def test_parser_rejects_out_of_grammar():
    assert _parse_predicate("length(b) > 2") is None
    assert _parse_predicate("a + 1 > 2") is None
    assert _parse_predicate("a > b") is None  # column-to-column: not supported
    assert _parse_predicate("") is None
