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
