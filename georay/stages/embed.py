"""Similarity search over embedding columns (``list<float>``).

- Brute-force cosine top-k: the baseline — broadcast query matrix, one
  numpy matmul per batch, per-batch partial top-k, tiny final merge.
- IVF (inverted-file) ANN: k-means centroids from a driver-side sample,
  per-batch cluster assignment, probe the nearest ``n_probe`` clusters
  only — the scale path (cuts the scanned fraction to n_probe/n_list).
- Hyperplane-LSH near-dup: random-projection sign buckets → candidate
  pairs → exact cosine verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dim = len(arr[0])
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def ann_brute_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k of each query against the whole dataset.

    Per-batch: one matmul + per-query partial top-k (≤ k rows per query
    per batch leave the map stage); final merge sorts the tiny partial
    set. Ties broken by id ascending — deterministic.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qn, np.asarray(query_ids)))

    cache: dict = {}

    def partial(batch: pa.Table) -> pa.Table:
        q, qids = cache.setdefault("q", ray.get(q_ref))
        m = _normalize(_embedding_matrix(batch, emb_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = m @ q.T  # (n, nq)
        take = min(k + (1 if exclude_self else 0), m.shape[0])
        top = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, nq)
        out_q, out_id, out_sim = [], [], []
        for j in range(q.shape[0]):
            out_q.append(np.full(take, qids[j]))
            out_id.append(ids[top[:, j]])
            out_sim.append(sims[top[:, j], j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim)),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    import pandas as pd

    df = pd.DataFrame(parts)
    if exclude_self:
        df = df[df["query_id"] != df[id_col]]
    df = df.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------- IVF ANN

class IVFIndex:
    """Inverted-file index: k-means centroids + per-cluster member lists."""

    def __init__(self, centroids: np.ndarray, assignments: np.ndarray, ids: np.ndarray, vecs: np.ndarray):
        self.centroids = centroids
        order = np.argsort(assignments, kind="stable")
        self.sorted_ids = ids[order]
        self.sorted_vecs = vecs[order]
        sa = assignments[order]
        self.cluster_offsets = np.searchsorted(sa, np.arange(centroids.shape[0] + 1))

    @staticmethod
    def train(vecs: np.ndarray, ids: np.ndarray, n_list: int = 16, iters: int = 10, seed: int = 3):
        """Plain Lloyd k-means on normalized vectors (driver side — at
        scale this trains on a Dataset sample, then assignment runs
        distributed per batch)."""
        v = _normalize(vecs)
        rng = np.random.default_rng(seed)
        cent = v[rng.choice(v.shape[0], size=min(n_list, v.shape[0]), replace=False)]
        for _ in range(iters):
            sims = v @ cent.T
            assign = np.argmax(sims, axis=1)
            for c in range(cent.shape[0]):
                m = assign == c
                if np.any(m):
                    cent[c] = v[m].mean(axis=0)
            cent = _normalize(cent)
        sims = v @ cent.T
        assign = np.argmax(sims, axis=1)
        return IVFIndex(cent, assign, np.asarray(ids), v)

    def search(self, queries: np.ndarray, k: int = 5, n_probe: int = 4):
        """(query_idx, id, sim) for top-k per query over probed clusters."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        csims = q @ self.centroids.T
        probe = np.argsort(-csims, axis=1)[:, :n_probe]
        out = []
        for qi in range(q.shape[0]):
            cand_idx = np.concatenate(
                [
                    np.arange(self.cluster_offsets[c], self.cluster_offsets[c + 1])
                    for c in probe[qi]
                ]
            )
            if cand_idx.size == 0:
                continue
            sims = self.sorted_vecs[cand_idx] @ q[qi]
            order = np.lexsort((self.sorted_ids[cand_idx], -sims))[:k]
            for o in order:
                out.append((qi, self.sorted_ids[cand_idx][o], float(sims[o])))
        return out


def ivf_ann_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_list: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """IVF ANN as a Dataset pipeline: the index is built once (from the
    materialized small table here; from a sample at scale) and broadcast;
    each batch probes it. Approximate — recall measured in tests."""
    tbl = pa.Table.from_pandas(ds.to_pandas())  # embeddings side is the small side
    vecs = _embedding_matrix(tbl, emb_col)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    index = IVFIndex.train(vecs, ids, n_list=n_list)
    rows = index.search(np.asarray(queries), k=k, n_probe=n_probe)
    return pa.table(
        {
            "query_id": pa.array([query_ids[r[0]] for r in rows]),
            id_col: pa.array([r[1] for r in rows]),
            "sim": pa.array([r[2] for r in rows]),
        }
    )


# -------------------------------------------------------- cosine near-dup

def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 11,
) -> pa.Table:
    """(id_a, id_b, sim) pairs with cosine ≥ threshold.

    Random-hyperplane signature buckets generate candidates (vectors with
    equal sign patterns); exact cosine verifies. Near-identical vectors
    collide with high probability; recall grows with fewer planes /
    multiple tables (documented approximation).
    """
    def sig_batch(batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch, emb_col))
        # fresh generator per call → identical planes in EVERY batch/task
        planes = np.random.default_rng(seed).standard_normal((m.shape[1], n_planes))
        bits = (m @ planes) > 0
        sig = np.zeros(m.shape[0], dtype=np.int64)
        for b in range(n_planes):
            sig |= bits[:, b].astype(np.int64) << b
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(sig),
                emb_col: batch[emb_col],
            }
        )

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        m = _normalize(_embedding_matrix(group, emb_col))
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        a = np.minimum(ids[iu[keep]], ids[ju[keep]])
        b = np.maximum(ids[iu[keep]], ids[ju[keep]])
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "sim": pa.array(sims[iu[keep], ju[keep]]),
            }
        )

    pairs = sigs.groupby("bucket").map_groups(pairs_of_bucket, batch_format="pyarrow")
    import pandas as pd

    df = pairs.to_pandas().drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
