"""Property-based tests (hypothesis) for the pure-Python kernels:
the type algebra (TypeSum lattice laws the reference relies on,
octosql/types.go:239-382) and CSV cell inference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from octosql_spark import types as ot
from octosql_spark.schema_infer import _infer_csv_cell

_SCALARS = [ot.NULL, ot.INT, ot.FLOAT, ot.BOOLEAN, ot.STRING, ot.TIME]


def _types(depth: int = 2) -> st.SearchStrategy:
    base = st.sampled_from(_SCALARS)
    if depth == 0:
        return base
    sub = _types(depth - 1)
    return st.one_of(
        base,
        st.builds(ot.list_of, sub),
        st.builds(lambda a, b: ot.struct_of({"x": a, "y": b}), sub, sub),
        st.builds(ot.union_of, sub, sub),
    )


@settings(max_examples=200)
@given(_types(), _types())
def test_type_sum_commutative(a, b):
    assert ot.type_sum(a, b) == ot.type_sum(b, a)


@settings(max_examples=100)
@given(_types(1), _types(1), _types(1))
def test_type_sum_associative(a, b, c):
    assert ot.type_sum(ot.type_sum(a, b), c) == \
        ot.type_sum(a, ot.type_sum(b, c))


@settings(max_examples=200)
@given(_types())
def test_type_sum_idempotent(a):
    assert ot.type_sum(a, a) == a


@settings(max_examples=200)
@given(_types(), _types())
def test_sum_is_upper_bound(a, b):
    # every value of `a` is a value of `a ⊔ b` (Is / at worst Maybe —
    # never ISNT; types.go Is() contract)
    s = ot.type_sum(a, b)
    assert ot.is_subtype(a, s) != ot.Is.ISNT
    assert ot.is_subtype(b, s) != ot.Is.ISNT


@given(st.integers(-10**17, 10**17))
def test_csv_cell_int(n):
    assert _infer_csv_cell(str(n)) == ot.INT


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_csv_cell_float_or_int(x):
    # any finite float renders to something the ladder accepts as a
    # number (Int for integral renderings, Float otherwise)
    assert _infer_csv_cell(repr(x)) in (ot.INT, ot.FLOAT)


@given(st.text(alphabet=st.characters(codec="ascii",
                                      exclude_characters="\r\n,\""),
               min_size=1))
def test_csv_cell_total(s):
    # inference is total: every cell gets exactly one type
    t = _infer_csv_cell(s)
    assert t in (ot.INT, ot.FLOAT, ot.BOOLEAN, ot.TIME, ot.STRING, ot.NULL)
