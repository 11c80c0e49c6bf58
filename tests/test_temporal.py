"""As-of join + session window operators on planted fixtures."""

import numpy as np
import pyarrow as pa
import pytest

from georay import ops


def test_asof_join_broadcast(ray_session):
    import ray.data as rd

    left = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5]),
                "k": pa.array([10, 10, 10, 20, 30]),
                "ts": pa.array([100, 250, 50, 500, 100], pa.int64()),
            }
        )
    )
    right = pa.table(
        {
            "k": pa.array([10, 10, 20, 20], pa.int64()),
            "rts": pa.array([100, 200, 400, 600], pa.int64()),
        }
    )
    out = ops.asof_join_broadcast(left, right, "k", "ts", "k", "rts").take_all()
    got = {r["id"]: r["matched_ts"] for r in out}
    # id1: ts=100 → rts 100; id2: ts=250 → 200; id3: ts=50 → none;
    # id4: k=20 ts=500 → 400; id5: k=30 → none
    assert got == {1: 100, 2: 200, 4: 400}


def test_sessionize(ray_session):
    import ray.data as rd

    rows = []
    # user 1: two sessions (gap 1000 splits at t=5000)
    for t in (0, 100, 200, 5000, 5100):
        rows.append({"u": 1, "ts": t, "eid": len(rows)})
    # user 2: single session
    for t in (10, 20):
        rows.append({"u": 2, "ts": t, "eid": len(rows)})
    ds = rd.from_items(rows)
    out = ops.sessionize(ds, "u", "ts", gap_us=1000, order_tiebreak="eid").take_all()
    sess = sorted(
        [(r["u"], r["session_start"], r["session_end"], r["n_events"]) for r in out]
    )
    assert sess == [(1, 0, 200, 3), (1, 5000, 5100, 2), (2, 10, 20, 2)]


def test_interval_join_count_brute_parity(ray_session):
    import ray.data as rd

    import numpy as np
    import pyarrow as pa

    from georay import ops

    rng = np.random.default_rng(17)
    starts = np.sort(rng.integers(0, 10_000, 300))
    probes = rng.integers(-100, 10_200, 500)
    width = 750
    right = pa.table({"start": pa.array(starts, pa.int64())})
    ds = rd.from_arrow(pa.table({"pid": pa.array(np.arange(500), pa.int64()),
                                 "ts": pa.array(probes, pa.int64())}))
    out = (
        ops.interval_join_count(ds, right, "ts", "start", width, out="n")
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    brute = np.array(
        [((starts <= t) & (t < starts + width)).sum() for t in probes]
    )
    assert np.array_equal(out["n"].to_numpy(), brute)
    # boundary semantics: ts == start counts, ts == start+width does not
    b = pa.table({"start": pa.array([100], pa.int64())})
    d2 = rd.from_arrow(pa.table({"ts": pa.array([100, 849, 850], pa.int64())}))
    n2 = ops.interval_join_count(d2, b, "ts", "start", 750, out="n").to_pandas()["n"]
    assert n2.tolist() == [1, 1, 0]


def test_interval_join_variable_width_brute_parity(ray_session):
    import ray.data as rd

    import numpy as np
    import pyarrow as pa

    from georay import ops

    rng = np.random.default_rng(23)
    starts = rng.integers(0, 10_000, 300)
    ends = starts + rng.integers(1, 2_000, 300)  # variable widths
    probes = rng.integers(-100, 12_000, 500)
    right = pa.table(
        {"start": pa.array(starts, pa.int64()), "end": pa.array(ends, pa.int64())}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(500), pa.int64()),
                "ts": pa.array(probes, pa.int64()),
            }
        )
    )
    out = (
        ops.interval_join_count(ds, right, "ts", "start", end_col="end", out="n")
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    brute = np.array([((starts <= t) & (t < ends)).sum() for t in probes])
    assert np.array_equal(out["n"].to_numpy(), brute)


def test_asof_partitioned_matches_broadcast_under_skew(ray_session):
    import ray.data as rd

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet  # noqa: F401

    from georay import ops

    rng = np.random.default_rng(29)
    n_l, n_r = 3000, 800
    # 80% of left rows share ONE hot key; right side has sparse keys so
    # some left keys have no match (inner-join drop path)
    lk = np.where(rng.random(n_l) < 0.8, 7, rng.integers(0, 50, n_l)).astype(np.int64)
    lt = rng.integers(0, 100_000, n_l)
    rk = rng.integers(0, 40, n_r).astype(np.int64)
    rt = rng.integers(0, 100_000, n_r)
    left = pa.table(
        {
            "eid": pa.array(np.arange(n_l), pa.int64()),
            "k": pa.array(lk),
            "ts": pa.array(lt, pa.int64()),
        }
    )
    right = pa.table({"k": pa.array(rk), "ts": pa.array(rt, pa.int64())})
    ds = rd.from_arrow(left).repartition(13)
    bc = (
        ops.asof_join_broadcast(ds, right, "k", "ts", "k", "ts", out_ts="m")
        .to_pandas()[["eid", "m"]]
        .sort_values("eid")
        .reset_index(drop=True)
    )
    pt = (
        ops.asof_join_partitioned(
            ds, rd.from_arrow(right), "k", "ts", "k", "ts", out_ts="m",
            left_payload=["eid"], n_buckets=8,
        )
        .to_pandas()[["eid", "m"]]
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert bc.equals(pt)


def test_window_lag_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    rng = np.random.default_rng(23)
    n = 1200
    t = pa.table({
        "u": pa.array([f"user{int(x)}" for x in rng.integers(0, 25, n)]),
        "ts": pa.array(np.sort(rng.integers(0, 10_000, n)).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.normal(size=n)),
    })
    ds = rd.from_arrow(t).repartition(5)
    got = (
        ops.window_lag(ds, key="u", ts="ts", value_col="val", order_tiebreak="eid", n_buckets=9)
        .to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    df["lag_value"] = df.groupby("u")["val"].shift(1)
    assert len(got) == len(df)
    a, b = got["lag_value"].to_numpy(), df["lag_value"].to_numpy()
    assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all()


def test_window_cumsum_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    rng = np.random.default_rng(29)
    n = 1000
    t = pa.table({
        "u": pa.array(rng.integers(0, 20, n), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 9000, n)).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        # negative integer-valued doubles exercise the index-propagated base
        "val": pa.array(rng.integers(-10, 10, n).astype(np.float64)),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = (
        ops.window_cumsum(ds, key="u", ts="ts", value_col="val", order_tiebreak="eid")
        .to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    df["running_sum"] = df.groupby("u")["val"].cumsum()
    assert np.array_equal(got["running_sum"].to_numpy(), df["running_sum"].to_numpy())


def test_interval_partitioned_matches_broadcast(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    rng = np.random.default_rng(83)
    n_e, n_i = 2000, 400
    ets = rng.integers(0, 1_000_000, n_e).astype(np.int64)
    t_e = pa.table({"eid": pa.array(np.arange(n_e), pa.int64()),
                    "ts": pa.array(ets)})
    starts = rng.integers(-50_000, 1_000_000, n_i).astype(np.int64)
    t_i = pa.table({"start": pa.array(starts)})
    W = 30_000

    bc = (ops.interval_join_count(rd.from_arrow(t_e).repartition(5), t_i, "ts", "start", width_us=W)
          .to_pandas().sort_values("eid").reset_index(drop=True))
    for bucket in (None, 7_000, 500_000):
        part = (ops.interval_join_count_partitioned(
                    rd.from_arrow(t_e).repartition(5),
                    rd.from_arrow(t_i).repartition(3),
                    "ts", "start", width_us=W, bucket_us=bucket, payload=["eid"])
                .to_pandas().sort_values("eid").reset_index(drop=True))
        assert np.array_equal(part["eid"].to_numpy(), bc["eid"].to_numpy())
        assert np.array_equal(part["n_matches"].to_numpy(), bc["n_matches"].to_numpy()), bucket


def test_window_rank_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    rng = np.random.default_rng(37)
    n = 900
    t = pa.table({
        "u": pa.array([f"u{int(x)}" for x in rng.integers(0, 15, n)]),
        "ts": pa.array(rng.integers(0, 5000, n).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = (
        ops.window_rank(ds, "u", ["ts", "eid"], n_buckets=7)
        .to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    df["rank"] = df.groupby("u").cumcount() + 1
    assert np.array_equal(got["rank"].to_numpy(), df["rank"].to_numpy())


def test_window_moving_sum_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    rng = np.random.default_rng(43)
    n = 1200
    t = pa.table({
        "u": pa.array(rng.integers(0, 10, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 8000, n).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.integers(-5, 10, n).astype(np.float64)),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = (
        ops.window_moving_sum(ds, "u", "ts", "val", 5, order_tiebreak="eid")
        .to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["u", "ts", "eid"]).reset_index(drop=True)
    df["ms"] = (
        df.groupby("u")["val"].rolling(5, min_periods=1).sum()
        .reset_index(level=0, drop=True)
    )
    assert np.array_equal(got["moving_sum"].to_numpy(), df["ms"].to_numpy())


def test_window_share_exact_integer(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 5.0, 0.0]),
        }
    )
    out = (
        ops.window_share(rd.from_arrow(tbl), "k", "v", scale_bits=4, n_buckets=2)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    # key 1 total 6: floor(16v/6) = 2, 5, 8; key 2 total 5: 0, 16
    assert out["share_q"].tolist() == [2, 5, 8, 0, 16]


def test_asof_tolerance_gate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    left = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([100, 200, 100], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([1, 1, 2], pa.int64()),
            "rts": pa.array([95, 50, 10], pa.timestamp("us")),
        }
    )
    # without tolerance: all three match backward (95, 95, 10)
    base = ops.asof_join_broadcast(
        rd.from_arrow(left), right, "k", "ts", "rk", "rts"
    ).to_pandas().sort_values(["k", "ts"])
    assert base["matched_ts"].tolist() == [95, 95, 10]
    # tolerance 20us: (1,200)->95 is 105 stale -> dropped, NOT rematched
    # to the even-staler 50; (2,100)->10 is 90 stale -> dropped
    tol = ops.asof_join_broadcast(
        rd.from_arrow(left), right, "k", "ts", "rk", "rts", tolerance=20
    ).to_pandas()
    assert tol["matched_ts"].tolist() == [95]


def test_peak_concurrency_tie_rule_and_shards(ray_session):
    """Exact sweep peak: sessions starting at the instant another ends
    both count (closed intervals, starts before ends); result is
    shard-count invariant."""
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    # [0,10] [10,20] overlap at t=10 -> peak 2; [30,40],[31,35],[32,33]
    # nest -> peak 3
    s = [0, 10, 30, 31, 32]
    e = [10, 20, 40, 35, 33]
    d = rd.from_arrow(pa.table({
        "t": pa.array(s + e, pa.int64()),
        "dlt": pa.array([1] * 5 + [-1] * 5, pa.int64()),
    }))
    for n_shards in (1, 4, 64):
        got = ops.peak_concurrency(d, "t", "dlt", n_shards=n_shards)
        assert got.to_pandas()["peak"].tolist() == [3], n_shards
