"""Distributed connected components over an edge list (Dataset).

Min-label propagation with ONE shuffle per round: the current
(node → label) table — o(number of nodes appearing in edges), for dedup
workloads the duplicate docs, never the corpus — is broadcast via
``ray.put``; each round maps over the (large, distributed) edge list
emitting ``(dst, label(src))`` + ``(src, label(src))`` candidates and
takes the per-node minimum with ``ops.tree_reduce`` (combine tree — no
sort-shuffle barrier; the label table is the bounded small side). No
per-node Python loops; lookups are vectorized ``searchsorted``.

Convergence: labels are monotonically non-increasing and reach the
component minimum after ``diameter`` rounds. The candidate generators in
``georay.stages.dedup`` bound component diameter by construction
(adjacent-W pairing links bucket members ≤ W apart, so an m-member
degenerate bucket has diameter ≈ m/W); ``max_rounds`` is a safety bound
and the loop stops as soon as a round changes nothing.

At extreme scale (label table too big to broadcast) the same loop can be
re-expressed as a two-groupby label⋈edge co-shuffle per round, or the
large-star/small-star contraction (O(log n) rounds) — the edge-list
dataflow shape is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def connected_components(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    local_edge_cutoff: int = 2_000_000,
) -> pa.Table:
    """(node, label) for every node appearing in ``pairs``; label = min
    node id of its connected component."""

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        # symmetric: propagate both directions
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    def empty_labels() -> pa.Table:
        return pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )

    n_edges = edges.count()
    if n_edges == 0:
        return empty_labels()

    # Small-edge-list fast path: the duplicate-pair edge list is the
    # SMALL side (it is the same magnitude as the label table that this
    # function materializes for broadcast anyway). Below the cutoff,
    # pull just the pairs and run the identical min-propagation +
    # pointer-jumping locally — saving 2-3 distributed rounds whose cost
    # is pure scheduling barrier, not data. Above it, the streaming loop
    # below handles arbritrarily large edge lists unchanged.
    if n_edges <= local_edge_cutoff:
        t = pa.concat_tables(
            edges.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        labels = nodes.copy()
        i_src = np.searchsorted(nodes, src)
        i_dst = np.searchsorted(nodes, dst)
        for _ in range(max_rounds):
            new = labels.copy()
            np.minimum.at(new, i_dst, labels[i_src])
            while True:
                jumped = new[np.searchsorted(nodes, new)]
                if np.array_equal(jumped, new):
                    break
                new = jumped
            if np.array_equal(new, labels):
                break
            labels = new
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "label": pa.array(labels, pa.int64())}
        )

    # round 0: label(x) = min(x, neighbors(x)) — no label table needed yet
    nodes = None  # sorted node array of the current label table
    labels = None  # label per node (aligned with ``nodes``)

    for _ in range(max_rounds):
        if nodes is None:
            lab_ref = None
        else:
            lab_ref = ray.put((nodes, labels))
        cache: dict = {}

        def emit(batch: pa.Table, _ref=lab_ref) -> pa.Table:
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            if _ref is None:
                lab_src = src
            else:
                n_s, l_s = cache.setdefault("m", ray.get(_ref))
                pos = np.searchsorted(n_s, src)
                lab_src = l_s[np.clip(pos, 0, n_s.size - 1)]
            return pa.table(
                {
                    "node": pa.array(np.concatenate([dst, src]), pa.int64()),
                    "cand": pa.array(np.concatenate([lab_src, lab_src]), pa.int64()),
                }
            )

        from georay import ops

        agg = ops.tree_reduce(
            edges.map_batches(
                emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            ),
            "node",
            {"cand": "label"},
            ufunc=np.minimum,
        ).take_all()
        new_nodes = np.asarray([r["node"] for r in agg], dtype=np.int64)
        new_labels = np.asarray([r["label"] for r in agg], dtype=np.int64)
        order = np.argsort(new_nodes)
        new_nodes, new_labels = new_nodes[order], new_labels[order]
        # pointer jumping on the driver-held table: label ← label(label)
        # until fixed. Free (pure numpy) and turns O(diameter) distributed
        # rounds into O(log diameter): a W-linked chain collapses after
        # one propagation round + ~log2 jumps.
        while True:
            idx = np.searchsorted(new_nodes, new_labels)
            jumped = new_labels[idx]
            if np.array_equal(jumped, new_labels):
                break
            new_labels = jumped
        if nodes is not None and np.array_equal(new_labels, labels):
            break
        nodes, labels = new_nodes, new_labels

    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "label": pa.array(labels, pa.int64())}
    )
