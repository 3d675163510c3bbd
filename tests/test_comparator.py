"""Unit tests for the parity comparator itself (tools/paritycheck.py).

The whole correctness story rests on `compare` actually catching
mismatches — these prove the gate can fail, not just pass.
No Spark needed: pure pandas in, problem list out.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from paritycheck import compare  # noqa: E402


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    assert compare("t", a, a.copy()) == []


def test_row_order_and_column_order_insensitive():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})
    assert compare("t", a, b) == []


def test_value_mismatch_caught():
    a = pd.DataFrame({"k": [1], "v": [1.5]})
    b = pd.DataFrame({"k": [1], "v": [1.6]})
    assert compare("t", a, b)


def test_row_count_mismatch_caught():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    assert compare("t", a, b)


def test_column_name_mismatch_caught():
    a = pd.DataFrame({"k": [1], "sum_qty": [2.0]})
    b = pd.DataFrame({"k": [1], "sum(l_quantity)": [2.0]})
    assert compare("t", a, b)


def test_array_columns_flagged_by_strict_driver_shape_check():
    """The driver's comparator crashes on list cells (observed round 1
    on d7_*), so the strict check must flag ANY array-valued column in
    an oracle-checked result — even when the values would match."""
    a = pd.DataFrame({"k": [1], "arr": [[1.0, 2.0]]})
    b_same = pd.DataFrame({"k": [1], "arr": [[1.0, 2.0]]})
    problems = compare("t", a, b_same)
    assert problems and any("strict" in p for p in problems)


def test_nan_equals_nan():
    a = pd.DataFrame({"v": [float("nan")]})
    assert compare("t", a, a.copy()) == []


def test_float_noise_below_round9_tolerated():
    a = pd.DataFrame({"v": [0.1234567891]})
    b = pd.DataFrame({"v": [0.1234567894]})
    assert compare("t", a, b) == []


# --- property-based fuzzing (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _cell = st.one_of(
        st.integers(-10**6, 10**6),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=8),
        st.none(),
    )

    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(st.tuples(_cell, _cell), min_size=1, max_size=20),
        seed=st.integers(0, 2**16),
    )
    def test_compare_is_permutation_invariant(rows, seed):
        """Any row/column permutation of a frame must compare equal to
        the original — the driver's check is order-insensitive."""
        import random as _random

        a = pd.DataFrame(rows, columns=["x", "y"])
        shuffled = list(rows)
        _random.Random(seed).shuffle(shuffled)
        b = pd.DataFrame(shuffled, columns=["x", "y"])[["y", "x"]]
        assert compare("t", a, b) == []

    @settings(max_examples=200, deadline=None)
    @given(rows=st.lists(st.tuples(st.integers(-100, 100)), min_size=1, max_size=10))
    def test_compare_catches_any_single_cell_change(rows):
        """Changing one integer cell must always be caught."""
        a = pd.DataFrame(rows, columns=["x"])
        b = a.copy()
        b.loc[0, "x"] = b.loc[0, "x"] + 1
        assert compare("t", a, b)
