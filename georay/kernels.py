"""Geometry compute kernels — vectorized NumPy re-expressions of the
reference's GeoArrowKernel registry (/root/reference/src/geoarrow.c:1996-2022).

Each scalar kernel maps 1 batch → 1 array (same length); each aggregate
kernel maps batches → a small mergeable partial, merged by Ray Data
(`map_batches` partials + a tiny final reduce), mirroring the reference's
push…push→finish protocol (/root/reference/src/geoarrow/geoarrow.h:875-905).

Semantics pinned to the reference:
- box: null→null, empty→(+Inf,+Inf,-Inf,-Inf), planar-only
  (src/geoarrow.c:1735-1935, planar check at 1746-1750)
- box_agg: never null; null features treated as empty (geoarrow.h:1172-1181)
- unique_geometry_types_agg: bitmask key ``dims*8 + geometry_type``; the
  bit is added only when a feature has ≥1 coordinate, so EMPTY features
  are excluded; output = ISO-WKB codes ``(dims-1)*1000 + geom`` sorted by
  bit index (src/geoarrow.c:1616-1733)
- inference promotion: single native type → itself; {POINT,MULTIPOINT}→
  MULTIPOINT, {LINESTRING,MULTILINESTRING}→MULTILINESTRING,
  {POLYGON,MULTIPOLYGON}→MULTIPOLYGON; anything else → WKB; dims union
  Z/M → XYZM (R/infer-default.R:85-152)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from georay.codecs import native
from georay.types import (
    CoordType,
    Dimensions,
    EdgeType,
    GeometryType,
    GeoType,
    TypeId,
)


def _require_planar(geo: GeoType, what: str) -> None:
    if geo.edge_type != EdgeType.PLANAR:
        # src/geoarrow.c:1746-1750 — box kernels are planar-only
        raise ValueError(f"{what} kernel is only valid for planar edges")


# ---------------------------------------------------------------- box

def box(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> pa.Array:
    """Per-feature 2D bounding box → geoarrow.box array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    _require_planar(geo, "box")

    if geo.geometry_type == GeometryType.BOX:
        mins, maxes, valid = native.box_view(arr, geo)
        mask = None if valid is None else ~valid
        return native.build_boxes(
            mins[:, :2], maxes[:, :2], GeoType.box(), mask=mask
        )

    v = native.view(arr, geo)
    n = v.length
    xmin = np.full(n, np.inf)
    ymin = np.full(n, np.inf)
    xmax = np.full(n, -np.inf)
    ymax = np.full(n, -np.inf)
    if v.coords.shape[0]:
        feat = v.feature_of_coord()
        x = v.coords[:, 0]
        y = v.coords[:, 1]
        # NaN coords (empty points) must not poison the min/max
        ok = ~(np.isnan(x) | np.isnan(y))
        if not ok.all():
            feat = feat[ok]
            x = x[ok]
            y = y[ok]
        np.minimum.at(xmin, feat, x)
        np.minimum.at(ymin, feat, y)
        np.maximum.at(xmax, feat, x)
        np.maximum.at(ymax, feat, y)
    mask = None if v.valid is None else ~v.valid
    mins = np.column_stack([xmin, ymin])
    maxes = np.column_stack([xmax, ymax])
    return native.build_boxes(mins, maxes, GeoType.box(), mask=mask)


def box_agg_partial(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None):
    """Per-batch partial for the global box: (xmin, ymin, xmax, ymax)."""
    b = box(arr, geo)
    mins, maxes, valid = native.box_view(b, GeoType.box())
    if valid is not None:
        mins = mins[valid]
        maxes = maxes[valid]
    if mins.shape[0] == 0:
        return (np.inf, np.inf, -np.inf, -np.inf)
    with np.errstate(invalid="ignore"):
        return (
            float(np.min(mins[:, 0])),
            float(np.min(mins[:, 1])),
            float(np.max(maxes[:, 0])),
            float(np.max(maxes[:, 1])),
        )


def box_agg_merge(partials) -> tuple[float, float, float, float]:
    """Commutative/associative merge — safe under any Ray Data ordering."""
    ps = list(partials)
    if not ps:
        return (np.inf, np.inf, -np.inf, -np.inf)
    a = np.asarray(ps, dtype=np.float64)
    return (
        float(a[:, 0].min()),
        float(a[:, 1].min()),
        float(a[:, 2].max()),
        float(a[:, 3].max()),
    )


# ------------------------------------------------------------ centroid

def centroid(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> pa.Array:
    """Per-feature coordinate-mean centroid → geoarrow.point.

    null→null, empty→(NaN, NaN) (the empty-point encoding). Planar only.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    _require_planar(geo, "centroid")
    v = native.view(arr, geo)
    n = v.length
    sx = np.zeros(n)
    sy = np.zeros(n)
    cnt = np.zeros(n)
    if v.coords.shape[0]:
        feat = v.feature_of_coord()
        x = v.coords[:, 0]
        y = v.coords[:, 1]
        ok = ~(np.isnan(x) | np.isnan(y))
        if not ok.all():
            feat = feat[ok]
            x = x[ok]
            y = y[ok]
        np.add.at(sx, feat, x)
        np.add.at(sy, feat, y)
        np.add.at(cnt, feat, 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        cx = np.where(cnt > 0, sx / cnt, np.nan)
        cy = np.where(cnt > 0, sy / cnt, np.nan)
    mask = None if v.valid is None else ~v.valid
    return native.build_points(np.column_stack([cx, cy]), GeoType.point(), mask=mask)


# ------------------------------------- unique_geometry_types_agg

def unique_types_partial(
    arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None
) -> int:
    """Per-batch uint64 bitmask, key = dims*8 + geometry_type."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))

    if geo.serialized in (TypeId.WKB, TypeId.LARGE_WKB, TypeId.WKB_VIEW):
        from georay.codecs import wkb as wkb_codec

        return wkb_codec.unique_types_mask(arr)
    if geo.serialized in (TypeId.WKT, TypeId.LARGE_WKT, TypeId.WKT_VIEW):
        from georay.codecs import wkt as wkt_codec

        return wkt_codec.unique_types_mask(arr)

    gt = geo.geometry_type
    if gt == GeometryType.BOX:
        # box features visit as polygons (src/geoarrow.c:2960-3028)
        mins, maxes, valid = native.box_view(arr, geo)
        nonempty = np.all(maxes[:, :2] >= mins[:, :2], axis=1)
        if valid is not None:
            nonempty &= valid
        if not np.any(nonempty):
            return 0
        return 1 << (int(Dimensions.XY) * 8 + int(GeometryType.POLYGON))

    v = native.view(arr, geo)
    if gt == GeometryType.POINT:
        # native POINTs are never EMPTY for this kernel (no all-NaN check),
        # per the kernel comment src/geoarrow.c:1616-1628
        any_feature = v.length > 0 and (
            v.valid is None or bool(np.any(v.valid))
        )
    else:
        counts = v.coord_counts()
        nonempty = counts > 0
        if v.valid is not None:
            nonempty &= v.valid
        any_feature = bool(np.any(nonempty))
    if not any_feature:
        return 0
    return 1 << (int(geo.dimensions) * 8 + int(gt))


def unique_types_finish(mask: int) -> list[int]:
    """Bitmask → sorted ISO-WKB int32 codes (src/geoarrow.c:1630-1733)."""
    out = []
    for bit in range(8, 40):
        if mask & (1 << bit):
            dims = bit // 8  # 1..4
            geom = bit % 8
            out.append((dims - 1) * 1000 + geom)
    return out


def infer_type_from_codes(
    codes: list[int],
    promote_multi: bool = True,
    coord_type: CoordType = CoordType.SEPARATE,
) -> GeoType:
    """schema_from_types_and_dims (R/infer-default.R:112-152)."""
    types = sorted({c % 1000 for c in codes})
    dims_codes = {c // 1000 + 1 for c in codes}
    has_z = bool(dims_codes & {2, 4})
    has_m = bool(dims_codes & {3, 4})
    if len(types) == 1 and 1 <= types[0] <= 6:
        geom = GeometryType(types[0])
    elif promote_multi and types == [1, 4]:
        geom = GeometryType.MULTIPOINT
    elif promote_multi and types == [2, 5]:
        geom = GeometryType.MULTILINESTRING
    elif promote_multi and types == [3, 6]:
        geom = GeometryType.MULTIPOLYGON
    else:
        return GeoType.wkb()
    if has_z and has_m:
        dims = Dimensions.XYZM
    elif has_z:
        dims = Dimensions.XYZ
    elif has_m:
        dims = Dimensions.XYM
    else:
        dims = Dimensions.XY
    return GeoType.native(geom, dimensions=dims, coord_type=coord_type)


# ------------------------------------------------- planar measure kernels

def _masked_float(out: np.ndarray, valid) -> pa.Array:
    if valid is None:
        return pa.array(out, pa.float64())
    return pa.array(out, pa.float64(), mask=~valid)


def length(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> pa.Array:
    """Planar length: 0 for points, polyline length for (multi)linestring,
    perimeter for (multi)polygon rings. null→null, empty→0. Vectorized:
    one diff over all coords, cross-part segments zeroed by offsets."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    _require_planar(geo, "length")
    v = native.view(arr, geo)
    n = v.length
    out = np.zeros(n)
    # points contribute no length: (MULTI)POINT returns all zeros — a
    # multipoint's consecutive points are NOT linestring segments
    if geo.geometry_type in (GeometryType.POINT, GeometryType.MULTIPOINT):
        return _masked_float(out, v.valid)
    if v.offsets and v.coords.shape[0] > 1:
        x = v.coords[:, 0]
        y = v.coords[:, 1]
        seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        # segment k connects vertex k→k+1; invalid when k+1 starts a new
        # innermost part (ring / linestring)
        inner = v.offsets[-1]
        bad = inner[1:-1] - 1  # boundary segments
        bad = bad[(bad >= 0) & (bad < seg.shape[0])]
        seg[bad] = 0.0
        feat = v.feature_of_coord()
        np.add.at(out, feat[:-1], seg)
    return _masked_float(out, v.valid)


def area(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> pa.Array:
    """Planar area per feature: sum of |shoelace| of each polygon's first
    (shell) ring minus |shoelace| of its interior (hole) rings — hole
    subtraction by RING POSITION, so the result is independent of ring
    winding (standard WKB/WKT does not constrain winding).
    Points/linestrings → 0; null→null; empty→0. Fully vectorized via
    reduceat over ring offsets."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    _require_planar(geo, "area")
    v = native.view(arr, geo)
    n = v.length
    out = np.zeros(n)
    if (
        geo.geometry_type in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON)
        and v.coords.shape[0] >= 3
    ):
        x = v.coords[:, 0]
        y = v.coords[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        ring_off = v.offsets[-1]
        n_rings = len(ring_off) - 1
        ring_sums = np.zeros(n_rings)
        nonempty = np.diff(ring_off) > 0
        starts = ring_off[:-1][nonempty]
        if starts.size:
            # reduceat sums cross[s : next_start]; subtract the wrap
            # element cross[e-1] that straddles the ring boundary (rings
            # are closed so it's not part of the shoelace sum)
            sums = np.add.reduceat(
                np.append(cross, 0.0), np.minimum(starts, cross.shape[0])
            )
            ends = ring_off[1:][nonempty] - 1
            wrap = np.where(ends < cross.shape[0], np.append(cross, 0.0)[ends], 0.0)
            ring_sums[nonempty] = 0.5 * (sums - wrap)
        # winding-independent: shell ring (first of each polygon) adds
        # |shoelace|, every later ring of the same polygon subtracts it
        poly_ring_off = v.offsets[-2]
        sign = np.full(n_rings, -1.0)
        pr_starts = poly_ring_off[:-1]
        pr_nonempty = np.diff(poly_ring_off) > 0
        sign[pr_starts[pr_nonempty]] = 1.0
        ring_contrib = sign * np.abs(ring_sums)
        # ring → feature ranges
        frs = v.offsets[0][:-1]
        fre = v.offsets[0][1:]
        for mid in v.offsets[1:-1]:
            frs = mid[frs]
            fre = mid[fre]
        csum = np.concatenate([[0.0], np.cumsum(ring_contrib)])
        out = csum[fre] - csum[frs]
    return _masked_float(out, v.valid)


# ----------------------------------------------------------------- cast

def cast(
    arr: pa.Array | pa.ChunkedArray,
    target: GeoType,
    source: GeoType | None = None,
) -> pa.Array:
    """as_geoarrow kernel (src/geoarrow.c:1578-1614): cast any geometry
    encoding to the requested type, any-to-any via the shared Node tree.

    Passthrough when source and target parse to the same id
    (R/array.R:121-124)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if source is None:
        source = GeoType.from_field(pa.field("g", arr.type))
    if source.id == target.id:
        return arr

    from georay.codecs import wkb as wkb_codec
    from georay.codecs import wkt as wkt_codec

    src_kind = (
        "wkb"
        if source.serialized in (TypeId.WKB, TypeId.LARGE_WKB, TypeId.WKB_VIEW)
        else "wkt"
        if source.serialized in (TypeId.WKT, TypeId.LARGE_WKT, TypeId.WKT_VIEW)
        else "native"
    )
    dst_kind = (
        "wkb"
        if target.serialized in (TypeId.WKB, TypeId.LARGE_WKB, TypeId.WKB_VIEW)
        else "wkt"
        if target.serialized in (TypeId.WKT, TypeId.LARGE_WKT, TypeId.WKT_VIEW)
        else "native"
    )

    if dst_kind == "wkt":
        return wkt_codec.encode(arr, source)
    if dst_kind == "wkb":
        if src_kind == "native":
            return wkb_codec.encode(arr, source)
        if src_kind == "wkt":
            # parse once, then (when the input is a single native type)
            # use the VECTORIZED native→WKB encoder instead of per-node
            # serialization; heterogeneous input keeps the per-node path
            nat, t = wkt_codec.decode(arr, None)
            if not t.serialized:
                return wkb_codec.encode(nat, t)
            nodes = [
                wkt_codec.parse_feature_wkt(v.as_py()) if v.is_valid else None
                for v in arr
            ]
            return pa.array(
                [None if n is None else wkt_codec._node_to_wkb(n) for n in nodes],
                pa.binary(),
            )
        return arr.cast(target.storage_type())
    # native destination
    if src_kind == "wkb":
        out, _ = wkb_codec.decode(arr, target)
        return out
    if src_kind == "wkt":
        out, _ = wkt_codec.decode(arr, target)
        return out
    if source.geometry_type == GeometryType.BOX:
        # box → polygon ring synthesis, reference ring order
        # (xmin ymin, xmax ymin, xmax ymax, xmin ymax, xmin ymin)
        # (src/geoarrow.c:2960-3028; fixture test-pkg-wk.R:234-239);
        # min>max in any dim → POLYGON EMPTY (src/geoarrow.c:2986-3016)
        mins, maxes, valid = native.box_view(arr, source)
        n = mins.shape[0]
        nonempty = np.all(maxes[:, :2] >= mins[:, :2], axis=1)
        if valid is not None:
            nonempty &= valid
        poly_counts = nonempty.astype(np.int64)
        poly_off = np.concatenate([[0], np.cumsum(poly_counts)])
        ne = np.nonzero(nonempty)[0]
        ring_off = np.arange(len(ne) + 1, dtype=np.int64) * 5
        coords = np.empty((len(ne) * 5, 2), dtype=np.float64)
        x0, y0 = mins[ne, 0], mins[ne, 1]
        x1, y1 = maxes[ne, 0], maxes[ne, 1]
        coords[0::5] = np.column_stack([x0, y0])
        coords[1::5] = np.column_stack([x1, y0])
        coords[2::5] = np.column_stack([x1, y1])
        coords[3::5] = np.column_stack([x0, y1])
        coords[4::5] = np.column_stack([x0, y0])
        mask = None if valid is None else ~valid
        poly = native.build_nested(
            coords,
            [poly_off, ring_off],
            GeoType.polygon(),
            mask=mask,
        )
        if target.geometry_type == GeometryType.POLYGON and target.dimensions == Dimensions.XY:
            return poly
        return cast(poly, target, GeoType.polygon())

    # native → native (dims / coord-type / promotion changes)
    nodes = wkt_codec.nodes_from_native(arr, source)
    return wkb_codec.build_native(nodes, target)


# ----------------------------------------------------------------- void

def void(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Kernel 1: null array of the input's length (pipeline smoke-test)."""
    return pa.nulls(len(arr))


def void_agg_partial(arr) -> None:
    return None


def void_agg_finish(_partials) -> pa.Array:
    return pa.nulls(1)


EARTH_RADIUS_KM = 6371.0088
# km spanned by one degree of latitude on the haversine sphere (π·R/180);
# one degree of longitude spans KM_PER_DEG · cos(lat).
KM_PER_DEG = np.pi * EARTH_RADIUS_KM / 180.0


def haversine_km(
    lon1: np.ndarray, lat1: np.ndarray, lon2, lat2
) -> np.ndarray:
    """Great-circle distance in km (haversine, mean Earth radius) — the
    geodesic companion to the planar metrics (the engine's joins are
    planar by default, matching the reference's planar-only kernels; use
    this column for geodesic filtering/scoring). Vectorized; the formula
    is written exactly as its SQL replica so a DuckDB oracle agrees to
    float ulp."""
    rl1 = np.radians(np.asarray(lon1, np.float64))
    rp1 = np.radians(np.asarray(lat1, np.float64))
    rl2 = np.radians(np.asarray(lon2, np.float64))
    rp2 = np.radians(np.asarray(lat2, np.float64))
    a = (
        np.sin((rp2 - rp1) / 2.0) ** 2
        + np.cos(rp1) * np.cos(rp2) * np.sin((rl2 - rl1) / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
