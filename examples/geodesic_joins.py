"""Both-sides-large GEODESIC joins (round 5): kNN, nearest and radius
under great-circle distance with no broadcast index — probe state rides
the cell co-shuffles as in-band rows, the pole-safe stopping bound runs
on the merge, and polar stalls finish through a lat-band row co-shuffle.

Run: PYTHONPATH=. python examples/geodesic_joins.py [sf_dir]
"""
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from georay import tpch  # noqa: E402
from georay.joins import (  # noqa: E402
    knn_geodesic_partitioned,
    nearest_geodesic_partitioned,
    radius_geodesic_count_partitioned,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

t = pq.read_table(f"{sf}/part.parquet", columns=["p_partkey"])
pk = t["p_partkey"].to_numpy().astype(np.int64)
probes = rd.from_arrow(pa.table({
    "p_partkey": pa.array(pk, pa.int64()),
    "lon": pa.array(((pk * 17) % 3600) / 10.0 - 180.0 + 0.05),
    "lat": pa.array(((pk * 23) % 1700) / 10.0 - 85.0 + 0.05),
}))
sx, sy, sk = tpch.supplier_points(sf)
refs = rd.from_arrow(pa.table({
    "s_suppkey": pa.array(sk, pa.int64()),
    "lon": pa.array(sx), "lat": pa.array(sy),
}))

knn = knn_geodesic_partitioned(
    probes, refs, k=3, probe_id_col="p_partkey", ref_id_col="s_suppkey"
)
print("3 nearest suppliers per part (great-circle milli-km):")
print(knn.to_pandas().sort_values(["p_partkey", "rank"]).head(6))

nearest = nearest_geodesic_partitioned(
    probes, refs, probe_id_col="p_partkey", ref_id_col="s_suppkey"
)
print("\nnearest supplier:", nearest.count(), "rows")

within = radius_geodesic_count_partitioned(
    probes, refs, radius_km=500.0, probe_id_col="p_partkey"
)
print("\nparts with suppliers within 500 km:", within.count())
ray.shutdown()
