"""Broadcast point-in-polygon join + tiling over the test tables.

Run: PYTHONPATH=. python examples/spatial_join.py [sf_dir]
"""
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import ops, tpch  # noqa: E402
from georay.joins import pip_join  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

pts = tpch.lineitem_points(sf)                      # geoarrow point column
pts = ops.add_cell_column(pts, level=12, parent_level=6)   # S2-style cells
joined = pip_join(pts, tpch.part_box_polygons(sf),  # broadcast index
                  geometry_col="geometry", id_col="p_partkey", mode="left")
joined = ops.add_tile_columns(joined, zoom=6)       # web-mercator tiles
hist = ops.salted_count(joined, "cell_parent", count_alias="n")
top = ops.top_k(hist, ["n", "cell_parent"], 10, descending=[True, False])
print(top.to_pandas())
ray.shutdown()
