"""sort_group fast-path equivalence: the tie-aware implementation must be
bit-identical to a whole-frame stable lexsort over all six keys (reference
fragment.py:115-140 ordering), across every path — already-sorted, unique
timestamps out of order, tied timestamps resolved by secondary keys, and
full ties resolved by stability (original index order)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pipe_segment_spark.operators.kernel import sort_group


def _reference_sort(pdf: pd.DataFrame) -> pd.DataFrame:
    ts = pdf["timestamp"].to_numpy("datetime64[us]").astype("int64")
    msgid = pdf["msgid"].fillna("").to_numpy(dtype="U")
    n_tok = pdf["n_tok"].fillna(np.iinfo(np.int64).max).to_numpy(dtype="int64")
    source = pdf["source"].fillna("").to_numpy(dtype="U")
    rec = pdf["rec_type"].fillna("").to_numpy(dtype="U")
    if "ident_value" in pdf.columns:
        ident = pdf["ident_value"].fillna("").to_numpy(dtype="U")
    else:
        ident = np.zeros(len(pdf), dtype="U1")
    return pdf.iloc[np.lexsort((ident, rec, source, n_tok, msgid, ts))]


def _frame(ts_s, msgid, n_tok=None, source=None, rec=None, ident=None):
    n = len(ts_s)
    return pd.DataFrame(
        {
            "timestamp": pd.to_datetime(
                np.asarray(ts_s, dtype="int64"), unit="s"
            ),
            "msgid": msgid,
            "n_tok": n_tok if n_tok is not None else list(range(n)),
            "source": source if source is not None else ["s"] * n,
            "rec_type": rec if rec is not None else ["POS"] * n,
            "ident_value": ident if ident is not None else [None] * n,
        }
    )


def _assert_same(pdf):
    got = sort_group(pdf).reset_index(drop=True)
    want = _reference_sort(pdf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # index path identical too (stability): compare row order, not just values
    assert list(sort_group(pdf).index) == list(_reference_sort(pdf).index)


def test_already_sorted_identity():
    pdf = _frame([1, 2, 3, 4], ["a", "b", "c", "d"])
    out = sort_group(pdf)
    assert out is pdf  # fast path returns the frame untouched
    _assert_same(pdf)


def test_unique_unsorted():
    pdf = _frame([4, 1, 3, 2], ["d", "a", "c", "b"])
    _assert_same(pdf)


def test_ties_broken_by_msgid():
    pdf = _frame([2, 1, 2, 1], ["z", "q", "a", "p"])
    out = sort_group(pdf)
    assert list(out["msgid"]) == ["p", "q", "a", "z"]
    _assert_same(pdf)


def test_ties_cascade_through_all_keys():
    # same ts + msgid -> n_tok; same n_tok -> source; then rec; then ident
    pdf = _frame(
        [5, 5, 5, 5],
        ["m", "m", "m", "m"],
        n_tok=[7, 7, 7, 3],
        source=["b", "a", "a", "x"],
        rec=["POS", "POS", "IDENT", "POS"],
        ident=[None, "v", "u", None],
    )
    _assert_same(pdf)


def test_full_ties_stable_original_order():
    pdf = _frame([9, 9, 9], ["m", "m", "m"], n_tok=[1, 1, 1])
    out = sort_group(pdf)
    assert list(out.index) == [0, 1, 2]
    _assert_same(pdf)


def test_nulls_sort_greatest():
    pdf = _frame(
        [3, 3, 3],
        [None, "a", "b"],
        n_tok=[None, 5, None],
    )
    _assert_same(pdf)


def test_mixed_tied_and_untied_runs():
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 40, size=200)  # plenty of collisions
    pdf = _frame(
        ts,
        [f"m{int(x):03d}" for x in rng.integers(0, 50, size=200)],
        n_tok=rng.integers(0, 9, size=200).tolist(),
        source=[["sa", "sb"][int(x)] for x in rng.integers(0, 2, size=200)],
        rec=[["POS", "IDENT"][int(x)] for x in rng.integers(0, 2, size=200)],
    )
    _assert_same(pdf)


@pytest.mark.parametrize("seed", range(5))
def test_randomized_equivalence(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    ts = rng.integers(0, max(2, n // 3), size=n)  # force ties
    pdf = _frame(
        ts,
        [f"x{int(v)}" for v in rng.integers(0, 10, size=n)],
        n_tok=rng.integers(0, 5, size=n).tolist(),
    )
    _assert_same(pdf)


def test_no_ident_column():
    pdf = _frame([2, 2, 1], ["b", "a", "c"]).drop(columns=["ident_value"])
    _assert_same(pdf)
