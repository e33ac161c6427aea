"""analytics.sum_by_keys — the sort + segment-fold sum for wide string-key
aggregations. Pins: exactness vs a pandas groupby, the block-boundary
diversion (hot key spanning whole blocks), empty/single-group inputs, and
parallelism invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from cassovary_ray.analytics import sum_by_keys


def run(df: pd.DataFrame, keys, value, parallelism=8,
        small_threshold=0) -> pd.DataFrame:
    # small_threshold=0 pins the FOLD path (the test inputs are all below
    # the production 50k-row crossover, which would route them through the
    # hash aggregate and leave the fold uncovered)
    ds = ray.data.from_pandas(df).repartition(parallelism)
    out = sum_by_keys(ds, keys, value, alias="n",
                      small_threshold=small_threshold).to_pandas()
    return out.sort_values(keys).reset_index(drop=True)


def want(df: pd.DataFrame, keys, value) -> pd.DataFrame:
    w = (df.groupby(keys, as_index=False)[value].sum()
         .rename(columns={value: "n"}))
    return w.sort_values(keys).reset_index(drop=True)


def test_string_pair_keys_exact():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "a": [f"u{v}" for v in rng.randint(0, 40, 5000)],
        "b": [f"t{v}" for v in rng.randint(0, 25, 5000)],
        "c": rng.randint(1, 9, 5000).astype(np.int64),
    })
    got = run(df, ["a", "b"], "c")
    pd.testing.assert_frame_equal(got, want(df, ["a", "b"], "c"))


def test_hot_key_spans_blocks():
    """One key holding 90% of rows folds to one boundary row per block it
    spans; the tiny merge must reassemble the exact total."""
    df = pd.DataFrame({
        "a": ["hot"] * 9000 + [f"k{v}" for v in range(1000)],
        "c": np.ones(10000, dtype=np.int64),
    })
    got = run(df, ["a"], "c", parallelism=16)
    assert int(got.loc[got.a == "hot", "n"].iloc[0]) == 9000
    pd.testing.assert_frame_equal(got, want(df, ["a"], "c"))


@pytest.mark.parametrize("parallelism", [1, 4, 16])
def test_parallelism_invariance(parallelism):
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": [f"u{v}" for v in rng.randint(0, 12, 800)],
        "c": rng.randint(-5, 6, 800).astype(np.int64),
    })
    got = run(df, ["a"], "c", parallelism=parallelism)
    pd.testing.assert_frame_equal(got, want(df, ["a"], "c"))


def test_single_group():
    df = pd.DataFrame({"a": ["x"] * 50,
                       "c": np.arange(50, dtype=np.int64)})
    got = run(df, ["a"], "c")
    assert got.n.tolist() == [int(np.arange(50).sum())]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3),
                          st.integers(-100, 100)),
                min_size=1, max_size=200))
def test_matches_pandas_fuzz(rows):
    df = pd.DataFrame(rows, columns=["ka", "kb", "c"])
    df["ka"] = df["ka"].map("g{}".format)
    df["c"] = df["c"].astype(np.int64)
    got = run(df, ["ka", "kb"], "c", parallelism=4)
    pd.testing.assert_frame_equal(got, want(df, ["ka", "kb"], "c"))


# -- fold_by_keys multi-op -----------------------------------------------------


def test_fold_multi_op_matches_pandas():
    from cassovary_ray.analytics import fold_by_keys

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": [f"md5_{v}" for v in rng.randint(0, 60, 4000)],
        "d": rng.randint(0, 500, 4000).astype(np.int64),
        "c": rng.randint(1, 7, 4000).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    got = (fold_by_keys(ds, ["k"],
                        [("d", "min", "min_d"), ("d", "max", "max_d"),
                         ("c", "sum", "total"), ("c", "count", "rows")],
                        small_threshold=0)
           .to_pandas().sort_values("k").reset_index(drop=True))
    w = (df.groupby("k").agg(min_d=("d", "min"), max_d=("d", "max"),
                             total=("c", "sum"), rows=("c", "size"))
         .reset_index().sort_values("k").reset_index(drop=True))
    w["rows"] = w["rows"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["k", "min_d", "max_d", "total",
                                       "rows"]], w)


def test_fold_count_sums_across_blocks():
    """A hot key spanning blocks emits one boundary COUNT partial per block;
    the merge must SUM the partials (not count them)."""
    from cassovary_ray.analytics import fold_by_keys

    df = pd.DataFrame({"k": ["hot"] * 5000 + ["cold"] * 10,
                       "c": np.ones(5010, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(16)
    got = (fold_by_keys(ds, ["k"], [("c", "count", "rows")],
                        small_threshold=0)
           .to_pandas().set_index("k")["rows"])
    assert int(got["hot"]) == 5000 and int(got["cold"]) == 10


# -- crossover, null guard, dtype widening ------------------------------------


def test_small_input_crossover_paths_agree():
    """Below the row threshold the call routes through Ray's hash
    aggregate; both paths must produce identical frames."""
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "a": [f"u{v}" for v in rng.randint(0, 30, 2000)],
        "c": rng.randint(-4, 9, 2000).astype(np.int64),
    })
    hash_path = run(df, ["a"], "c", small_threshold=1_000_000)
    fold_path = run(df, ["a"], "c", small_threshold=0)
    pd.testing.assert_frame_equal(hash_path, fold_path)
    pd.testing.assert_frame_equal(hash_path, want(df, ["a"], "c"))


@pytest.mark.parametrize("small_threshold", [0, 1_000_000])
def test_null_values_rejected(small_threshold):
    """Nulls would split groups in the fold (NaN != NaN) but merge in the
    hash aggregate — fold_by_keys refuses them on either path."""
    from cassovary_ray.analytics import fold_by_keys

    df = pd.DataFrame({"k": ["a", "b", None, "a"],
                       "c": pd.array([1, 2, 3, 4], dtype="Int64")})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="null"):
        fold_by_keys(ds, ["k"], [("c", "sum", "n")],
                     small_threshold=small_threshold).to_pandas()


@pytest.mark.parametrize("small_threshold", [0, 1_000_000])
def test_narrow_dtypes_widen(small_threshold):
    """int32 / float32 value columns widen to 64-bit before either path so
    interior reduceat partials union cleanly with the boundary merge."""
    from cassovary_ray.analytics import fold_by_keys

    df = pd.DataFrame({
        "k": ["x"] * 300 + ["y"] * 300,
        "i": np.ones(600, dtype=np.int32),
        "f": np.full(600, 0.5, dtype=np.float32),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    got = (fold_by_keys(ds, ["k"],
                        [("i", "sum", "si"), ("f", "sum", "sf")],
                        small_threshold=small_threshold)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["si"].dtype == np.int64 and got["sf"].dtype == np.float64
    assert got["si"].tolist() == [300, 300]
    assert got["sf"].tolist() == [150.0, 150.0]
