"""Exact statistics at scale: radix-select quantiles (unbounded
domains), clamped ledger scans, hierarchy rollups, rank tests.

Run: PYTHONPATH=. python examples/exact_statistics.py [sf_dir]
"""
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import ops, tpch  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

li = rd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])

# exact quantile_disc on an unbounded double column: 4 streaming
# passes, no sort, no shuffle, no sample — any number of quantiles
print("exact price quantiles (radix select):")
print(ops.exact_quantiles_radix(
    li, "l_extendedprice", [0.01, 0.5, 0.99]).to_pandas())

# interpolated (quantile_cont) twin — both bracketing ranks on the
# same passes
print("interpolated median:")
print(ops.exact_quantiles_radix_cont(
    li, "l_extendedprice", [0.5]).to_pandas())

# per-group variant: every (group, q) narrows its own prefix, all
# riding the same 4 passes
lif = rd.read_parquet(f"{sf}/lineitem.parquet",
                      columns=["l_returnflag", "l_extendedprice"])
print("per-flag p99 (grouped radix):")
g = ops.grouped_quantiles_radix(
    lif, "l_returnflag", "l_extendedprice", [0.99]).to_pandas()
print(g.sort_values("l_returnflag"))

# floor-at-zero running ledger (distributed clamped prefix scan)
print("ledger levels (first rows):")
print(tpch.q_stock_level(sf).to_pandas().head())

# hierarchy rollup via pointer-doubling ancestor closure
print("subtree rollup (first rows):")
print(tpch.q_subtree_rollup(sf).to_pandas().head())

# Kruskal-Wallis rank-test sufficient stats without a sort
print("rank-test stats:")
print(tpch.q_kruskal(sf).to_pandas())

ray.shutdown()
