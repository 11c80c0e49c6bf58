"""LLM training-data prep: curation, dedup, BM25, BPE, packing.

Run: PYTHONPATH=. python examples/training_data_prep.py [sf_dir]
"""
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False

from georay import ops  # noqa: E402
from georay.stages import text  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

# quality + language gates, exact dedup
ds = text.add_language_id(docs)
ds = text.add_quality(ds)
ds = text.add_fingerprint(ds)
ds = ops.dedup_exact(ds, "fingerprint", keep_col="doc_id")
print("after curation:", ds.count(), "docs")

# BM25 search over the curated corpus
hits = text.bm25_topk(docs, ["spark", "hash"], k=5)
print("bm25 top-5:")
print(hits.to_pandas())

# BPE tokenizer trained on the corpus; per-doc token counts
merges = text.bpe_train(docs, n_merges=50)
counted = text.add_bpe_token_count(docs, merges)
print("bpe token counts:")
print(counted.select_columns(["doc_id", "n_bpe_tokens"]).to_pandas().head())

# pack into fixed 512-token sequences (global prefix sum)
packed = ops.pack_sequences(
    counted.select_columns(["doc_id", "n_bpe_tokens"]),
    "doc_id", "n_bpe_tokens", budget=512,
)
print("packing:")
print(packed.to_pandas().head())

# deterministic epoch shuffle with exact global positions, persisted
# as a range-clustered layout: a loader reads any batch window
# sequentially from a handful of partitions
import tempfile  # noqa: E402

from georay import pipeline  # noqa: E402

pos = ops.hash_shuffle_rank(docs.select_columns(["doc_id"]), "doc_id",
                            epoch=1)
lay = tempfile.mkdtemp(prefix="georay_shuffle_")
pipeline.write_sorted(pos, lay, "pos", n_ranges=8)
window, n_opened, n_total = pipeline.read_range(lay, 0, 64,
                                                columns=["doc_id", "pos"])
print(f"epoch-1 window [0,64): {window.count()} rows from "
      f"{n_opened}/{n_total} partitions")
ray.shutdown()
