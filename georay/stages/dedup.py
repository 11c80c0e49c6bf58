"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact: fingerprint per batch (map-side) → ``groupby(fingerprint)``
  keep-first — one shuffle of (id, fingerprint) pairs only.
- MinHash-LSH: per-batch shingle→signature (vectorized per doc) →
  explode to (band, band_hash, doc_id) rows → ``groupby`` buckets →
  candidate pairs → Jaccard verify → connected components. Components
  run as driver-side union-find over the (small) verified-pair set; at
  10^12-doc scale that final step becomes a few rounds of min-label
  propagation via groupby — the pair generation (the expensive part)
  is already fully distributed here.
- SimHash: 64-bit signature per doc; near-dup candidates share one of
  four 16-bit bands (Hamming ≤ 3 ⇒ at least one band equal by
  pigeonhole when the 3 differing bits fall in ≤3 bands).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray.data

from georay.stages.text import add_fingerprint, normalize_text

# ------------------------------------------------------------------ exact

def dedup_exact_text(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the first (min id) row per normalized-text fingerprint."""
    from georay import ops

    ds = add_fingerprint(ds, text_col)
    return ops.dedup_exact(ds, "fingerprint", keep_col=id_col)


# ---------------------------------------------------------------- minhash

N_HASHES = 64
N_BANDS = 16  # 16 bands × 4 rows
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Stable 64-bit hashes of char k-shingles of the normalized text."""
    s = normalize_text(text or "")
    if len(s) < k:
        shingles = [s] if s else []
    else:
        shingles = [s[i : i + k] for i in range(len(s) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, sh in enumerate(set(shingles)):
        out[i] = int.from_bytes(
            hashlib.blake2b(sh.encode(), digest_size=8).digest(), "little"
        )
    return out[: len(set(shingles))]


def _hash_params(n: int = N_HASHES, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, n, dtype=np.int64).astype(np.uint64)
    return a, b


_A, _B = _hash_params()


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """(N_HASHES,) uint64 signature; empty docs → all-max sentinel."""
    h = _shingle_hashes(text, k)
    if h.shape[0] == 0:
        return np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_hashes, n_shingles) universal hashing, min over shingles
    v = (_A[:, None] * h[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1)


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    sa = set(np.asarray(_shingle_hashes(a, k)).tolist())
    sb = set(np.asarray(_shingle_hashes(b, k)).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _band_rows_batch(batch: pa.Table, text_col: str, id_col: str, k: int) -> pa.Table:
    """Explode each doc into N_BANDS (band, band_hash, id) rows."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    rows_per = N_HASHES // N_BANDS
    band_ids = np.empty(n * N_BANDS, dtype=np.int64)
    band_hash = np.empty(n * N_BANDS, dtype=np.int64)
    out_ids = np.repeat(ids, N_BANDS)
    for i, t in enumerate(texts):
        sig = minhash_signature(t, k)
        for b in range(N_BANDS):
            h = hashlib.blake2b(
                sig[b * rows_per : (b + 1) * rows_per].tobytes(), digest_size=8
            ).digest()
            band_ids[i * N_BANDS + b] = b
            band_hash[i * N_BANDS + b] = int.from_bytes(h, "little", signed=True)
    return pa.table(
        {
            "band": pa.array(band_ids),
            "band_hash": pa.array(band_hash),
            id_col: pa.array(out_ids),
        }
    )


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> ray.data.Dataset:
    """(id_a, id_b) candidate pairs sharing ≥1 LSH band bucket."""
    bands = ds.map_batches(
        lambda b: _band_rows_batch(b, text_col, id_col, shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        a, b = [], []
        # bucket sizes are tiny under a sane threshold; cap the blowup on
        # degenerate buckets (all-identical docs)
        for i in range(len(ids) - 1):
            for j in range(i + 1, min(i + 51, len(ids))):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        pairs_of_bucket, batch_format="pyarrow"
    )
    return pairs


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> "pa.Table":
    """Full near-dup pipeline → pa.Table (doc_id, cluster_id, is_dup).

    cluster_id = min doc id in the connected component of verified pairs
    (Jaccard ≥ threshold); is_dup marks non-representative members.
    """
    texts_tbl = ds.select_columns([id_col, text_col]).take_all()
    text_of = {r[id_col]: r[text_col] for r in texts_tbl}  # small side (docs table)

    pairs = minhash_candidate_pairs(ds, text_col, id_col, shingle_k).take_all()
    seen = set()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for r in pairs:
        key = (r["id_a"], r["id_b"])
        if key in seen:
            continue
        seen.add(key)
        if jaccard_shingles(text_of[r["id_a"]], text_of[r["id_b"]], shingle_k) >= threshold:
            union(r["id_a"], r["id_b"])

    all_ids = sorted(text_of)
    cluster = [find(i) for i in all_ids]
    return pa.table(
        {
            id_col: pa.array(all_ids, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "is_dup": pa.array([c != i for i, c in zip(all_ids, cluster)]),
        }
    )


# ----------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in normalize_text(text or "").split():
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def add_simhash(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch[text_col].to_pylist()]
        return batch.append_column("simhash", pa.array(hs, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def simhash_candidates(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Candidate near-dup pairs: equal 16-bit SimHash band (pigeonhole
    guarantee for Hamming distance ≤ 3). Verification = exact Hamming."""
    sh = add_simhash(ds, text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bands = []
        bvals = []
        oids = []
        for b in range(4):
            bands.append(np.full(len(ids), b, dtype=np.int64))
            bvals.append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            oids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "band_val": pa.array(np.concatenate(bvals)),
                id_col: pa.array(np.concatenate(oids)),
                "simhash": pa.array(np.tile(batch["simhash"].to_numpy(zero_copy_only=False), 4)),
            }
        )

    exploded = sh.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        hs = group["simhash"].to_pylist()
        order = np.argsort(ids)
        a, b, d = [], [], []
        for x in range(len(ids) - 1):
            for y in range(x + 1, min(x + 51, len(ids))):
                i, j = order[x], order[y]
                ham = bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1")
                a.append(ids[i])
                b.append(ids[j])
                d.append(ham)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int64()),
            }
        )

    pairs = exploded.groupby(["band", "band_val"]).map_groups(
        pairs_of_bucket, batch_format="pyarrow"
    )
    tbl = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    return pa.Table.from_pandas(tbl.reset_index(drop=True), preserve_index=False)
