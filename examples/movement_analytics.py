"""Movement & map-matching tour: geofence clip, snap join, rose,
Douglas–Peucker simplification, LTTB downsampling, OD matrix.

Run: PYTHONPATH=. python examples/movement_analytics.py [sf_dir]
"""
import sys

import numpy as np
import pyarrow as pa

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import analytics, joins, tpch  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
pts = tpch._event_points(sf)

stats = analytics.trajectory_stats(
    pts, "user_id", "ts", "lon", "lat", tiebreak_col="event_id"
).to_pandas()
print(f"tracks: {len(stats)} users, "
      f"median path {stats['path_q'].median() / (1 << 20):.1f} deg")

clip = analytics.trajectory_clip_rect(
    pts, "user_id", "ts", "lon", "lat", rect=(-60, -40, 60, 40),
    tiebreak_col="event_id",
).to_pandas()
print(f"geofence clip: {clip['clip_q'].sum() / (1 << 20):.1f} deg of track "
      "inside the rect corpus-wide")

rose = analytics.movement_rose(
    pts, "user_id", "ts", "lon", "lat", tiebreak_col="event_id"
).to_pandas()
print("rose (global octant counts):",
      rose.groupby("octant")["n"].sum().tolist())

simp = analytics.simplify_tracks(
    pts, "user_id", "ts", "lon", "lat", epsilon=0.5, tiebreak_col="event_id"
)
print(f"Douglas-Peucker eps=0.5deg: {pts.count()} fixes -> {simp.count()}")

ds = rd.read_parquet(f"{sf}/events.parquet",
                     columns=["user_id", "ts", "event_id", "value"])
lttb = analytics.lttb_downsample(ds, "user_id", "ts", "value", 20,
                                 tiebreak_col="event_id")
print(f"LTTB to <=20 points/user: {ds.count()} -> {lttb.count()} rows")

# snap every first fix to the supplier stub network (map-matching)
segs = tpch._supplier_segments(sf)
snapped = joins.nearest_segment_join(
    pts.map_batches(lambda b: b.select(["event_id", "lon", "lat"]),
                    batch_format="pyarrow", batch_size=None),
    segs,
)
d2 = snapped.to_pandas()["d2_q"].to_numpy() / float(1 << 20)
print(f"snap join: median point-to-segment distance "
      f"{np.sqrt(np.median(d2)):.2f} deg over {len(d2)} points")

ray.shutdown()
