"""Inverted-index text search: build the postings layout once, then run
bucket-pruned boolean search and index-path BM25 against it.

Run: PYTHONPATH=. python examples/text_search.py [sf_dir]
"""
import shutil
import sys
import tempfile

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import pipeline  # noqa: E402
from georay.stages.text import bm25_topk  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
idx = tempfile.mkdtemp(prefix="georay_example_postings_")
shutil.rmtree(idx, ignore_errors=True)

# pay the token-hash exchange ONCE at write time
pipeline.write_postings(docs, idx, n_buckets=16)

# boolean search reads only the query terms' buckets
hits = pipeline.postings_search(idx, ["merge", "window"], mode="and")
print("docs containing BOTH 'merge' and 'window':", hits.count())

# ranked search: the index path is bit-identical to the full scan
terms = ["spark", "hash", "window", "sort"]
top_idx = pipeline.postings_bm25(idx, terms, k=5).to_pandas()
top_full = bm25_topk(docs, terms, k=5).to_pandas()
print("\nindex-path BM25 top-5:")
print(top_idx.sort_values("score", ascending=False).to_string(index=False))
assert sorted(top_idx["score"]) == sorted(top_full["score"])
print("\nfull-scan parity: OK")

shutil.rmtree(idx, ignore_errors=True)
ray.shutdown()
