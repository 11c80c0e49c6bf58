"""Co-purchase graph: degrees, triangles, components, PageRank.

Run: PYTHONPATH=. python examples/graph_analytics.py [sf_dir]
"""
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import analytics  # noqa: E402
from georay.stages.components import connected_components  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

li = rd.read_parquet(f"{sf}/lineitem.parquet",
                     columns=["l_orderkey", "l_partkey"])
edges = analytics.cooccurrence_edges(
    li, "l_orderkey", "l_partkey", min_support=2
).materialize()
print("degree histogram:")
print(analytics.degree_distribution(edges).to_pandas().head())
print("triangles:", analytics.triangle_count(edges).to_pandas()["n_triangles"][0])
labels = connected_components(edges, id_a="a", id_b="b")
print("components:", len(set(labels["label"].to_pylist())))
pr = analytics.pagerank(edges, n_iter=3).to_pandas()
print("top pagerank:")
print(pr.sort_values("rank_q", ascending=False).head())

# session-6 family: communities, quality, cohesion, recommendations
lpa = analytics.label_propagation(edges, rounds=3)
mod = analytics.modularity(edges, lpa).to_pandas()
print("LPA modularity: q_num =", int(mod["q_num"][0]),
      "of 4m^2 =", 4 * int(mod["m_edges"][0]) ** 2)
truss = analytics.ktruss_edges(edges, k=3, rounds=3)
print("3-truss edges:", truss.count())
import numpy as np  # noqa: E402
seeds = np.sort(lpa.to_pandas()["node"].to_numpy())[:3]
ppr = analytics.pagerank(edges, n_iter=3, seeds=seeds).to_pandas()
print("personalized pagerank (3 seeds), top:")
print(ppr.sort_values("rank_q", ascending=False).head(3))
sim = analytics.item_similarity_topk(li, "l_orderkey", "l_partkey", k=3)
print("item-item recommendations:")
print(sim.to_pandas().head())
ray.shutdown()
