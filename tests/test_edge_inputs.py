"""Degenerate-input sweep: every bucketed/combine-tree operator must
handle EMPTY and single-row datasets (reduceat/searchsorted edge cases
— the shapes a real 100-TB run hits in sparse partitions)."""

import numpy as np
import pyarrow as pa
import pytest

from georay import ops


EMPTY = pa.table({
    "k": pa.array([], pa.int64()), "s": pa.array([], pa.string()),
    "ts": pa.array([], pa.int64()), "v": pa.array([], pa.float64()),
})
ONE = pa.table({
    "k": pa.array([5], pa.int64()), "s": pa.array(["x"]),
    "ts": pa.array([100], pa.int64()), "v": pa.array([2.0]),
})


@pytest.mark.parametrize("tbl,expect", [(EMPTY, 0), (ONE, 1)])
def test_operators_on_degenerate_inputs(tbl, expect, ray_session):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    cases = {
        "dedup_exact": lambda d: ops.dedup_exact(d, "s", keep_col="k"),
        "group_top_k": lambda d: ops.group_top_k(d, "k", ["v"], 2),
        "sessionize_int": lambda d: ops.sessionize(d, key="k", ts="ts", gap_us=10),
        "sessionize_str": lambda d: ops.sessionize(d, key="s", ts="ts", gap_us=10),
        "window_lag": lambda d: ops.window_lag(d, "k", "ts", "v"),
        "window_cumsum": lambda d: ops.window_cumsum(d, "k", "ts", "v"),
        "grouped_quantiles": lambda d: ops.grouped_quantiles(d, "k", "v", [0.5]),
        "pivot_count": lambda d: ops.pivot_count(d, "k", "s", ["x", "y"]),
        "heavy_hitters": lambda d: ops.heavy_hitters(d, "s", 0.5),
        "top_k": lambda d: ops.top_k(d, "v", 3),
        "focal_sum": lambda d: ops.focal_sum(
            rd.from_arrow(pa.table({"grid_cell": tbl["k"], "n": tbl["k"]}))
        ),
    }
    for name, fn in cases.items():
        r = fn(ds)
        n = r.count() if isinstance(r, rd.Dataset) else len(r)
        assert n == expect, name
    # profile emits one row per column; an all-empty dataset produces no
    # batches, hence no rows (documented)
    assert ops.profile_columns(ds, ["k", "v", "s"]).count() == (3 if expect else 0)
