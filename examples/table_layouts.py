"""Persistent table layouts: pay the exchange once at write time, then
prune at every read.

Demonstrates the four clustered layouts on one synthetic table:
  1. range clustering + zone maps        (1D range scans)
  2. bloom sidecar                       (point lookups on a NON-sort key)
  3. Z-order clustering                  (2D rect scans from ONE sort key)
  4. co-clustered merge join             (zero-exchange equality join)
  5. versioned layout                    (time travel, merge-on-read)

Run: PYTHONPATH=. python examples/table_layouts.py
"""
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import pipeline  # noqa: E402

root = tempfile.mkdtemp(prefix="georay_example_layouts_")
rng = np.random.default_rng(7)
n = 200_000
t = pa.table(
    {
        "id": pa.array(rng.permutation(n).astype(np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-90, 90, n)),
        "v": pa.array(rng.integers(0, 1000, n)),
    }
)
ds = rd.from_arrow(t)

# 1+2: range-clustered by ts, bloom over the unordered id column
# (size bloom_bits ~10x the keys per partition: 200k/32 = 6.25k keys
#  -> 2^18 bits keeps the false-positive rate well under 1%)
d_range = f"{root}/by_ts"
pipeline.write_sorted(ds, d_range, "ts", n_ranges=32, bloom_col="id",
                      bloom_bits=1 << 18)
scan, opened, total = pipeline.read_range(d_range, 10_000, 20_000)
print(f"range scan  : opened {opened}/{total} partitions, "
      f"{scan.count()} rows in [10k, 20k)")
probe = [int(x) for x in rng.integers(0, n, 5)]
hit, opened, total = pipeline.read_bloom_lookup(d_range, probe,
                                                columns=["id", "v"])
print(f"bloom lookup: opened {opened}/{total} partitions for "
      f"{len(probe)} ids -> {hit.count()} rows")

# 3: Z-order clustering — a 2D rect scan prunes from one sort key
d_z = f"{root}/zorder"
pipeline.write_zorder(ds, d_z, "lon", "lat", bits=8, n_ranges=32)
rect, opened, total = pipeline.read_rect_zorder(
    d_z, 10.0, 40.0, -20.0, 10.0, columns=["id"])
print(f"zorder rect : opened {opened}/{total} partitions -> "
      f"{rect.count()} rows in the lon/lat box")

# 4: co-clustered merge join — both tables share splits, join is local
d_a, d_b = f"{root}/join_a", f"{root}/join_b"
other = rd.from_arrow(pa.table({
    "id": pa.array(np.arange(0, n, 2, dtype=np.int64)),
    "w": pa.array(np.arange(0, n, 2, dtype=np.int64) * 3),
}))
pipeline.write_sorted(ds, d_a, "id", n_ranges=32, bounds=(0, n - 1))
pipeline.write_sorted(other, d_b, "id", n_ranges=32, bounds=(0, n - 1))
joined = pipeline.sorted_merge_join(d_a, d_b, on="id",
                                    columns_a=["v"], columns_b=["w"])
print(f"merge join  : {joined.count()} rows with ZERO query-time exchange")

# 5: versioned layout — upsert + tombstone, read any snapshot
d_v = f"{root}/versioned"
pipeline.write_versioned(d_v, ds.limit(1000), key="id")
delta = rd.from_arrow(pa.table({
    "id": pa.array([1, 2], pa.int64()),
    "ts": pa.array([0, 0], pa.int64()),
    "lon": pa.array([0.0, 0.0]), "lat": pa.array([0.0, 0.0]),
    "v": pa.array([999_999, 0], pa.int64()),
    "_deleted": pa.array([0, 1], pa.int64()),
}))
pipeline.append_version(d_v, delta)
v1 = pipeline.read_version(d_v, 1).count()
v2 = pipeline.read_version(d_v, 2).count()
print(f"time travel : v1 has {v1} rows, v2 has {v2} "
      f"(one upsert, one tombstone)")

shutil.rmtree(root, ignore_errors=True)
ray.shutdown()
