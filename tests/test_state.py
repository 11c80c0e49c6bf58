"""Shared-mutable-state tier: streaming first-seen dedup filter."""

import numpy as np
import pyarrow as pa

from georay.state import StreamingDedup


def test_streaming_dedup_set_matches_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(55)
    fps = [f"fp{int(x):04d}" for x in rng.integers(0, 400, 3000)]
    t = pa.table({"fingerprint": pa.array(fps),
                  "rid": pa.array(np.arange(3000), pa.int64())})
    ds = rd.from_arrow(t).repartition(6)

    f = StreamingDedup(n_shards=4)
    out = f.filter(ds, "fingerprint").to_pandas()
    # the surviving KEY SET is exactly the distinct set; one row each
    assert sorted(out["fingerprint"]) == sorted(set(fps))
    assert f.n_seen() == len(set(fps))

    # incremental: a second dataset with overlapping + new keys only
    # emits the NEW keys
    fps2 = [f"fp{int(x):04d}" for x in rng.integers(300, 500, 1000)]
    t2 = pa.table({"fingerprint": pa.array(fps2),
                   "rid": pa.array(np.arange(1000), pa.int64())})
    out2 = f.filter(rd.from_arrow(t2).repartition(3), "fingerprint").to_pandas()
    new = set(fps2) - set(fps)
    assert sorted(out2["fingerprint"]) == sorted(new)
    assert f.n_seen() == len(set(fps) | set(fps2))
