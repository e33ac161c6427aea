"""Distributed join strategies (`joins.broadcast_hash_join`,
`joins.shuffle_join`) — parity with pandas merges, null-key semantics,
empty build sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray import joins


def _probe_ds():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2, None], pa.int64()),
        "pv": pa.array([10, 20, 30, 40, 21, 99], pa.int64()),
    }))


def _build_ds():
    return ray.data.from_arrow(pa.table({
        "bk": pa.array([2, 3, 5], pa.int64()),
        "bv": pa.array(["b2", "b3", "b5"], pa.string()),
    }))


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_broadcast_inner():
    out = joins.broadcast_hash_join(_probe_ds(), _build_ds(),
                                    on="k", right_on="bk").to_pandas()
    assert sorted(out.columns) == ["bv", "k", "pv"]
    want = pd.DataFrame({"k": [2, 3, 2], "pv": [20, 30, 21],
                         "bv": ["b2", "b3", "b2"]})
    pd.testing.assert_frame_equal(_sorted(out[["k", "pv", "bv"]]),
                                  _sorted(want), check_dtype=False)


def test_broadcast_left_keeps_unmatched_and_null_keys():
    out = joins.broadcast_hash_join(_probe_ds(), _build_ds(), on="k",
                                    right_on="bk", how="left").to_pandas()
    assert len(out) == 6
    unmatched = out[out["bv"].isna()]
    assert sorted(unmatched["pv"]) == [10, 40, 99]  # k=1, k=4, k=None


@pytest.mark.parametrize("how,want_pv", [
    ("semi", [20, 30, 21]),
    ("anti", [10, 40, 99]),
])
def test_broadcast_semi_anti(how, want_pv):
    out = joins.broadcast_hash_join(_probe_ds(), _build_ds(), on="k",
                                    right_on="bk", how=how).to_pandas()
    assert sorted(out.columns) == ["k", "pv"]  # probe schema only
    assert sorted(out["pv"]) == sorted(want_pv)


def test_broadcast_empty_build():
    empty = ray.data.from_arrow(pa.table({
        "bk": pa.array([], pa.int64()), "bv": pa.array([], pa.string())}))
    inner = joins.broadcast_hash_join(_probe_ds(), empty, on="k",
                                      right_on="bk").to_pandas()
    assert len(inner) == 0
    anti = joins.broadcast_hash_join(_probe_ds(), empty, on="k",
                                     right_on="bk", how="anti").to_pandas()
    assert len(anti) == 6


def test_broadcast_bad_how():
    with pytest.raises(ValueError, match="how"):
        joins.broadcast_hash_join(_probe_ds(), _build_ds(), on="k",
                                  right_on="bk", how="cross")


def test_shuffle_inner_matches_pandas():
    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "lv": np.arange(500)})
    right = pd.DataFrame({"k": rng.integers(0, 50, 200),
                          "rv": np.arange(200) * 7})
    got = joins.shuffle_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", num_partitions=4).to_pandas()
    want = left.merge(right, on="k")
    pd.testing.assert_frame_equal(
        _sorted(got[["k", "lv", "rv"]]), _sorted(want), check_dtype=False)


def test_shuffle_anti_matches_pandas():
    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": [2, 4, 9]})
    got = joins.shuffle_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how="anti", num_partitions=2).to_pandas()
    assert sorted(got["k"]) == [1, 3]
