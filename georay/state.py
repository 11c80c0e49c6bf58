"""Shared mutable state — the LAST-RESORT tier of the engine's operator
taxonomy (SURVEY §4: prefer map_batches; then actor-pool map_batches
with per-actor state; raw named actors ONLY where the Dataset API
cannot express the semantics).

The one such case here: a STREAMING first-seen filter. Shuffle-based
``ops.dedup_exact`` needs the whole keyspace co-located per task (one
all-to-all); a streaming pipeline that must emit rows as they arrive —
an ingest firehose dropping already-seen fingerprints incrementally,
across MULTIPLE datasets/runs — needs membership state that every
concurrent task can consult and update. That is a shared mutable index:
inexpressible as a pure batch transform.

Design for scale: the seen-set is SHARDED over ``n_shards`` actors by
key hash (splitmix over the 64-bit key), so memory and request load
spread; each batch makes ONE call per shard it touches (vectorized
membership check inside the actor, not per key). Determinism: the SET
of surviving keys equals exact-dedup's; WHICH duplicate row survives is
arrival-order-dependent (inherent to streaming dedup — document, don't
hide).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from georay.ops import _key_hash


@ray.remote
class SeenShard:
    """One shard of the distributed seen-set. Holds keys as a python set
    of int64 hashes; ``check_and_add`` is vectorized per call (one numpy
    in/out per batch-shard, not per key)."""

    def __init__(self):
        self.seen: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """For each hash (in order): True if NEW (first occurrence ever,
        including earlier in this same array), and mark it seen."""
        s = self.seen
        out = np.empty(hashes.shape[0], dtype=bool)
        for i, h in enumerate(hashes.tolist()):
            if h in s:
                out[i] = False
            else:
                s.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self.seen)


class StreamingDedup:
    """Streaming first-seen filter over a key column (int or string):
    drops every row whose key hash was already seen by ANY earlier batch
    in this filter's lifetime. Survives across multiple datasets — pass
    the same instance to filter an entire ingest session incrementally.

    64-bit key hashes stand in for keys (``ops._bytes_hash`` gives every
    byte position a distinct mix64 coefficient at any key length, so
    collision odds are ~n²/2⁶⁵ for arbitrary-length keys — negligible
    below ~10⁹ keys per filter; shard count bounds per-actor memory).
    Use ``ops.dedup_exact`` when a one-shot shuffle is
    acceptable; use this when rows must stream out incrementally.
    """

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [SeenShard.remote() for _ in range(n_shards)]

    def filter(self, ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
        shards = self.shards
        n_shards = self.n_shards

        def fn(batch: pa.Table) -> pa.Table:
            h = _key_hash(batch, [key])
            if h is None:
                raise TypeError("StreamingDedup requires int or string keys")
            h = h.view(np.int64)
            shard_of = (h.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
            keep = np.zeros(len(batch), dtype=bool)
            # one actor call per shard TOUCHED by this batch; calls to
            # different shards run concurrently
            pend = []
            for s in np.unique(shard_of):
                idx = np.nonzero(shard_of == s)[0]
                pend.append((idx, shards[int(s)].check_and_add.remote(h[idx])))
            for idx, ref in pend:
                keep[idx] = ray.get(ref)
            return batch.filter(pa.array(keep))

        return ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    def n_seen(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))
