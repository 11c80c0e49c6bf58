"""Spatial joins (SURVEY.md §2.B5/B6), three execution shapes:

1. **Broadcast + fused stateless tasks** (default): the small-side index
   ships once via ``ray.put`` and is cached per worker process; the probe
   fuses with the upstream read chain. The big side never shuffles.
2. **Broadcast + actor pool**: a callable CLASS materializes the index
   ONCE per actor in ``__init__`` (the reference's kernel ``start()``
   analogue, src/geoarrow.c:1936-1996) — for huge indexes / heavy state.
3. **Co-partitioned** (``pip_join_partitioned``): both sides large — one
   ``groupby(cell)`` shuffle co-locates points with the polygons covering
   their cell; the same vectorized kernel joins each bucket locally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from georay import ops
from georay.index import PointIndex, PolygonIndex


class PIPJoiner:
    """Point-in-polygon probe stage.

    modes: "inner" (one output row per match, point cols + polygon cols),
    "left" (every point, null polygon_id when no match), "semi" (points
    with ≥1 match), "anti" (points with no match).
    """

    def __init__(self, index_ref, geom_col: str, mode: str, payload_cols):
        self.index: PolygonIndex = ray.get(index_ref)
        self.geom_col = geom_col
        self.mode = mode
        self.payload_cols = payload_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon, lat = ops.point_lonlat(batch, self.geom_col)
        # NaNs (null/empty points) match nothing: encode to a probe value
        # that cannot hit the index
        bad = ~(np.isfinite(lon) & np.isfinite(lat))
        lon = np.where(bad, 1e9, lon)
        lat = np.where(bad, 1e9, lat)
        n = len(batch)
        if self.mode == "inner":
            pidx, poly = self.index.contains(lon, lat)
            out = batch.take(pa.array(pidx))
            out = out.append_column(
                "polygon_id", pa.array(self.index.polygon_ids[poly].tolist())
            )
            return out
        # left/semi/anti need only the FIRST match → early-exit probe
        first = self.index.contains_first(lon, lat)
        has = first >= 0
        if self.mode == "semi":
            return batch.filter(pa.array(has))
        if self.mode == "anti":
            return batch.filter(pa.array(~has))
        if self.mode == "left":
            ids = np.full(n, None, dtype=object)
            ids[has] = self.index.polygon_ids[first[has]]
            return batch.append_column("polygon_id", pa.array(ids.tolist()))
        raise ValueError(f"unknown mode {self.mode}")


def pip_join(
    points: ray.data.Dataset,
    polygons: pa.Table,
    geom_col: str = "geotag",
    geometry_col: str = "geometry",
    id_col: str = "polygon_id",
    mode: str = "inner",
    res: float | None = None,
    concurrency=(2, 8),
    batch_size=None,
    num_cpus: float = 1.0,
    actor_pool: bool = False,
) -> ray.data.Dataset:
    """B5: broadcast PIP join. ``polygons`` must be the SMALL side (it is
    materialized once per worker); the points Dataset streams through.

    Two execution shapes:
    - ``actor_pool=False`` (default): stateless tasks + ``ray.put``
      broadcast with a per-worker-process cache. The stage FUSES with the
      upstream read/map chain (no extra object-store hop for wide rows,
      no pool spin-up) — right when the index is small-to-medium.
    - ``actor_pool=True``: a dedicated ``map_batches(Cls, concurrency=…)``
      actor pool — right when the index is huge (load it exactly
      ``concurrency`` times) or probes need GPU/heavy per-actor state.
    """
    index = PolygonIndex.build(
        polygons, geometry_col=geometry_col, id_col=id_col, res=res
    )
    ref = ray.put(index)
    if actor_pool:
        return points.map_batches(
            PIPJoiner,
            fn_constructor_args=(ref, geom_col, mode, None),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )

    cache: dict = {}

    def pip_fn(batch: pa.Table) -> pa.Table:
        # one fetch per worker process (the dict deserializes fresh into
        # each worker, then persists across that worker's tasks)
        joiner = cache.get("j")
        if joiner is None:
            joiner = PIPJoiner(ref, geom_col, mode, None)
            cache["j"] = joiner
        return joiner(batch)

    return points.map_batches(
        pip_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def pip_count(
    points: ray.data.Dataset,
    polygons: pa.Table,
    geom_col: str = "geotag",
    geometry_col: str = "geometry",
    id_col: str = "polygon_id",
    res: float | None = None,
    count_alias: str = "n",
) -> ray.data.Dataset:
    """PIP join + per-polygon COUNT with the aggregation pushed INTO the
    probe stage: each batch emits one (polygon, partial count) row per
    matched polygon instead of materializing every joined row — the
    join-then-aggregate pattern with no wide intermediate. Exact."""
    index = PolygonIndex.build(
        polygons, geometry_col=geometry_col, id_col=id_col, res=res
    )
    ref = ray.put(index)
    cache: dict = {}

    def probe_count(batch: pa.Table) -> pa.Table:
        idx: PolygonIndex = cache.setdefault("i", ray.get(ref))
        lon, lat = ops.point_lonlat(batch, geom_col)
        bad = ~(np.isfinite(lon) & np.isfinite(lat))
        pidx, poly = idx.contains(
            np.where(bad, 1e9, lon), np.where(bad, 1e9, lat)
        )
        counts = np.bincount(poly, minlength=idx.n_polygons)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                id_col: pa.array(idx.polygon_ids[nz].tolist()),
                "partial_n": pa.array(counts[nz], pa.int64()),
            }
        )

    partials = points.map_batches(
        probe_count, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # combine-tree merge of the tiny per-batch partials — no shuffle
    return ops.tree_sum(
        partials, id_col, {"partial_n": count_alias}, int_cols=("partial_n",)
    )


def pip_join_partitioned(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    geom_col: str = "geotag",
    geometry_col: str = "geometry",
    id_col: str = "polygon_id",
    point_id_col: str = "image_id",
    res: float = 2.0,
) -> ray.data.Dataset:
    """BOTH-SIDES-LARGE PIP join: no broadcast. Each side is keyed by the
    same grid cell (points: their cell; polygons: every cell of their
    exact bbox cover), co-partitioned with one ``groupby(cell)``
    shuffle, and joined bucket-locally with the same vectorized even-odd
    kernel. Duplicate matches from multi-cell polygons are impossible:
    a point's single cell meets each covering polygon exactly once.

    Output: inner-join pairs (point id columns + polygon id). Pick ``res``
    so a bucket's polygons fit a worker's heap (document the skew: a
    dense city cell = one map_groups task; split res finer to shard it).
    """
    from georay import cells as c
    from georay.codecs import native as nat
    from georay.codecs import wkb as wkb_codec
    from georay.types import GeoType

    def key_points(batch: pa.Table) -> pa.Table:
        lon, lat = ops.point_lonlat(batch, geom_col)
        bad = ~(np.isfinite(lon) & np.isfinite(lat))
        cell = c.grid_cell(np.where(bad, 1e9, lon), np.where(bad, 1e9, lat), res)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "side": pa.array(np.zeros(len(batch), np.int8)),
                # string-typed so the union with the polygon side always
                # type-checks regardless of the caller's id dtype
                "pt_id": batch[point_id_col].cast(pa.string()),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                id_col: pa.array([None] * len(batch), pa.int64()),
                "wkb": pa.array([None] * len(batch), pa.binary()),
            }
        )

    def key_polygons(batch: pa.Table) -> pa.Table:
        from georay import kernels

        geo = GeoType.from_field(batch.schema.field(geometry_col))
        b = kernels.box(batch[geometry_col], geo)
        mins, maxes, valid = nat.box_view(b, GeoType.box())
        bbox = np.concatenate([mins, maxes], axis=1)
        ok = np.isfinite(bbox[:, 0]) & (bbox[:, 2] >= bbox[:, 0])
        if valid is not None:
            ok &= valid
        from georay.index import _cover_bboxes_grid

        keys, poly_idx = _cover_bboxes_grid(bbox, ok, res)
        wkb_col = wkb_codec.encode(batch[geometry_col], geo)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = keys.shape[0]
        return pa.table(
            {
                "cell": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(n, np.int8)),
                "pt_id": pa.array([None] * n, pa.string()),
                "lon": pa.array(np.full(n, np.nan)),
                "lat": pa.array(np.full(n, np.nan)),
                id_col: pa.array(ids[poly_idx], pa.int64()),
                "wkb": wkb_col.take(pa.array(poly_idx)),
            }
        )

    pts_keyed = points.map_batches(
        key_points, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    polys_keyed = polygons.map_batches(
        key_polygons, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    both = pts_keyed.union(polys_keyed)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        pts = group.filter(pa.array(side == 0))
        pls = group.filter(pa.array(side == 1))
        empty = pa.table(
            {
                "pt_id": pa.array([], pts.column("pt_id").type),
                id_col: pa.array([], pa.int64()),
            }
        )
        if len(pts) == 0 or len(pls) == 0:
            return empty
        from georay.index import PolygonIndex
        from georay.types import GeoType

        # decode to MULTIPOLYGON: POLYGON upcasts losslessly, and the
        # broadcast path (PolygonIndex.build) accepts MULTIPOLYGON too, so
        # both physical plans take the same inputs
        nat_poly, t = wkb_codec.decode(
            pls["wkb"].combine_chunks(), GeoType.multipolygon()
        )
        tbl = pa.table(
            {id_col: pls[id_col]},
            schema=pa.schema([pa.field(id_col, pa.int64())]),
        ).append_column(GeoType.multipolygon().field(geometry_col), nat_poly)
        idx = PolygonIndex.build(tbl, geometry_col=geometry_col, id_col=id_col, res=res)
        lon = pts["lon"].to_numpy(zero_copy_only=False)
        lat = pts["lat"].to_numpy(zero_copy_only=False)
        # restrict matches to THIS bucket's cell so multi-cell polygons
        # can't double-match a point probed in a different bucket
        cell_here = group["cell"][0].as_py()
        own_cell = c.grid_cell(lon, lat, res) == cell_here
        pidx, poly = idx.contains(np.where(own_cell, lon, 1e9), np.where(own_cell, lat, 1e9))
        return pa.table(
            {
                "pt_id": pts["pt_id"].take(pa.array(pidx)),
                id_col: pa.array(idx.polygon_ids[poly].astype(np.int64), pa.int64()),
            }
        )

    return both.groupby("cell").map_groups(join_bucket, batch_format="pyarrow")


class KNNJoiner:
    """kNN probe stage via grid-cell ring expansion (exact under the
    planar (lon,lat) metric; ring-r stop bound proven in PointIndex.knn)."""

    def __init__(self, index_ref, geom_col: str, k: int, id_out: str, probe_id_col):
        self.index: PointIndex = ray.get(index_ref)
        self.geom_col = geom_col
        self.k = k
        self.id_out = id_out
        self.probe_id_col = probe_id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon, lat = ops.point_lonlat(batch, self.geom_col)
        P, R, D = self.index.knn(lon, lat, self.k)
        out = batch.take(pa.array(P))
        ids = self.index.ref_ids[R]
        out = out.append_column(self.id_out, pa.array(ids.tolist()))
        out = out.append_column("knn_dist2", pa.array(D, pa.float64()))
        rank = np.zeros(P.shape[0], dtype=np.int64)
        if P.shape[0]:
            # D is sorted within each probe; rank = position within probe
            new = np.ones(P.shape[0], dtype=bool)
            new[1:] = P[1:] != P[:-1]
            starts = np.nonzero(new)[0]
            rank = np.arange(P.shape[0]) - np.repeat(starts, np.diff(np.append(starts, P.shape[0])))
        out = out.append_column("knn_rank", pa.array(rank + 1, pa.int64()))
        return out


def knn_join(
    probes: ray.data.Dataset,
    ref_lon: np.ndarray,
    ref_lat: np.ndarray,
    ref_ids: np.ndarray,
    k: int = 3,
    geom_col: str = "geotag",
    res: float | None = None,
    id_out: str = "neighbor_id",
    concurrency=(2, 8),
    batch_size=None,
    num_cpus: float = 1.0,
    actor_pool: bool = False,
) -> ray.data.Dataset:
    """B6: broadcast kNN join: each probe row fans out to ≤k result rows
    (neighbor id, squared planar distance, rank). Same stateless-task vs
    actor-pool tradeoff as ``pip_join``."""
    if res is None:
        # aim for ~a few refs per cell: res ≈ sqrt(area/ n_ref) over the
        # lon/lat rectangle, clamped to sane bounds
        n = max(len(ref_ids), 1)
        res = float(np.clip(np.sqrt(360.0 * 180.0 / n) * 2.0, 0.25, 30.0))
    index = PointIndex.build(
        np.asarray(ref_lon, np.float64), np.asarray(ref_lat, np.float64), ref_ids, res
    )
    ref = ray.put(index)
    if actor_pool:
        return probes.map_batches(
            KNNJoiner,
            fn_constructor_args=(ref, geom_col, k, id_out, None),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )

    cache: dict = {}

    def knn_fn(batch: pa.Table) -> pa.Table:
        joiner = cache.get("j")
        if joiner is None:
            joiner = KNNJoiner(ref, geom_col, k, id_out, None)
            cache["j"] = joiner
        return joiner(batch)

    return probes.map_batches(
        knn_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
