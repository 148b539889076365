"""Property-based soundness of the data-skipping decision logic.

Pure-Python (no Spark session): `_file_prunable` may ONLY return True
when the file's [min, max] range PROVES no row can match — a false
positive silently drops rows from `read(where=)`, which is the one
failure mode the table layer must never have. Hypothesis drives random
ranges, in-range values, and predicates to hunt for such a case.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from privacy_cdc_lakehouse_spark.tables import _add_exclude, _file_prunable

_OPS_PY = {
    "=": lambda x, v: x == v,
    "<": lambda x, v: x < v,
    "<=": lambda x, v: x <= v,
    ">": lambda x, v: x > v,
    ">=": lambda x, v: x >= v,
}


@settings(max_examples=500, deadline=None)
@given(
    lo=st.integers(-1000, 1000),
    span=st.integers(0, 200),
    x_off=st.integers(0, 200),
    v=st.integers(-1500, 1500),
    op=st.sampled_from(list(_OPS_PY)),
)
def test_prunable_never_drops_a_matching_row(lo, span, x_off, v, op):
    """If any in-range value x satisfies `x op v`, the file must NOT be
    prunable for that predicate."""
    hi = lo + span
    x = lo + (x_off % (span + 1))  # an actual row value inside [lo, hi]
    stats = {"c": {"min": lo, "max": hi, "nulls": 0}}
    if _OPS_PY[op](x, v):
        assert not _file_prunable(stats, "c", op, v), (lo, hi, x, op, v)


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(-1000, 1000),
    span=st.integers(0, 200),
    v=st.integers(-1500, 1500),
    op=st.sampled_from(list(_OPS_PY)),
)
def test_prunable_is_exact_for_closed_int_ranges(lo, span, v, op):
    """For integer stats the decision is tight: prunable iff NO value in
    [lo, hi] satisfies the predicate (completeness, not just
    soundness)."""
    hi = lo + span
    stats = {"c": {"min": lo, "max": hi, "nulls": 0}}
    any_match = any(_OPS_PY[op](x, v) for x in (lo, hi)) or (
        op == "=" and lo <= v <= hi
    )
    assert _file_prunable(stats, "c", op, v) == (not any_match)


def test_prunable_unknown_stats_never_prune():
    assert not _file_prunable({}, "c", "=", 5)
    assert not _file_prunable({"c": {"min": None, "max": 3}}, "c", "=", 5)
    assert not _file_prunable({"c": {"min": "a", "max": "z"}}, "c", ">", 5)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-20, 20), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
def test_add_exclude_in_list_merge_preserves_union(int_lists):
    """Merging same-column integer IN-lists must preserve the exact set
    union of excluded values (a row is excluded iff it matches ANY
    original predicate)."""
    excludes: list[str] = []
    expected: set[int] = set()
    for vals in int_lists:
        _add_exclude(excludes, f"c IN ({', '.join(map(str, vals))})")
        expected |= set(vals)
    assert len(excludes) == 1  # all merged into one predicate
    import re

    got = {int(x) for x in re.findall(r"-?\d+", excludes[0])}
    assert got == expected
