"""Zero-copy views over GeoArrow-native nested arrays + builders.

The reference walks these layouts with a visitor (ArrayView visit,
/root/reference/src/geoarrow.c:2455-3058); georay instead exposes the
same buffers — coord arrays, per-level offsets, validity — as NumPy
views so kernels vectorize over whole batches (SURVEY.md §2.A row 15).

``GeomView`` is the engine's common currency: every geometry kernel
(`box`, centroid, PIP, cast, WKB/WKT encode) consumes it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from georay.types import CoordType, Dimensions, GeometryType, GeoType

# nesting depth (number of list levels) per geometry type
NESTING = {
    GeometryType.POINT: 0,
    GeometryType.LINESTRING: 1,
    GeometryType.MULTIPOINT: 1,
    GeometryType.POLYGON: 2,
    GeometryType.MULTILINESTRING: 2,
    GeometryType.MULTIPOLYGON: 3,
}


@dataclass
class GeomView:
    """NumPy view of one native-geometry column chunk.

    - ``coords``: (n_coords, ndim) float64 — column-stacked for SEPARATE,
      reshaped zero-copy for INTERLEAVED.
    - ``offsets``: outermost-first list of int64 arrays; ``offsets[k][i]``
      indexes into ``offsets[k+1]`` (or into ``coords`` for the last).
      Absolute (they already include any slice offset of the source).
    - ``valid``: bool array or None (all valid).
    """

    geo: GeoType
    length: int
    coords: np.ndarray
    offsets: list[np.ndarray]
    valid: np.ndarray | None

    # ------------------------------------------------------------ derived
    def coord_range(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-feature [start, end) into ``coords`` (vectorized chain)."""
        if not self.offsets:
            idx = np.arange(self.length + 1, dtype=np.int64)
            return idx[:-1], idx[1:]
        start = self.offsets[0][:-1]
        end = self.offsets[0][1:]
        for nxt in self.offsets[1:]:
            start = nxt[start]
            end = nxt[end]
        return start, end

    def coord_counts(self) -> np.ndarray:
        s, e = self.coord_range()
        return e - s

    def feature_of_coord(self) -> np.ndarray:
        """For each coordinate (within per-feature ranges), owning feature id.

        Note: with nested offsets the per-feature coordinate runs are
        contiguous, so ``np.repeat`` over counts is exact.
        """
        return np.repeat(np.arange(self.length, dtype=np.int64), self.coord_counts())

    def is_empty(self) -> np.ndarray:
        """Empty features: zero coords, or (points) all-NaN coords, per the
        reference's all-NaN-point-is-empty rule
        (/root/reference/src/r-wk-handle-stream.cc:195-222)."""
        if self.geo.geometry_type == GeometryType.POINT:
            if self.coords.shape[0] == self.length:
                return np.all(np.isnan(self.coords), axis=1)
            # sliced/odd case — fall through to counts
        return self.coord_counts() == 0


def _list_offsets(arr: pa.Array) -> np.ndarray:
    """Absolute offsets of a (large_)list array, honoring slices."""
    off = arr.offsets
    return off.to_numpy(zero_copy_only=False).astype(np.int64)


def _coords_from(arr: pa.Array, geo: GeoType) -> np.ndarray:
    ndim = geo.dimensions.count
    if geo.coord_type == CoordType.INTERLEAVED or pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(-1, ndim)
    cols = [
        arr.field(i).to_numpy(zero_copy_only=False) for i in range(arr.type.num_fields)
    ]
    return np.column_stack(cols) if cols else np.empty((0, ndim))


def view(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> GeomView:
    """Build a GeomView over a native GeoArrow array (zero/low-copy).
    Registered extension arrays (georay.extension) are unwrapped."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ExtensionArray):
        if geo is None:
            geo = GeoType.from_field(pa.field("g", arr.type))
        arr = arr.storage
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    gt = geo.geometry_type
    if gt == GeometryType.BOX:
        raise ValueError("box arrays are plain structs; use box_view()")
    depth = NESTING[gt]
    valid = None
    if arr.null_count > 0:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)

    offsets: list[np.ndarray] = []
    cur = arr
    for level in range(depth):
        if pa.types.is_fixed_size_list(cur.type):
            break
        offsets.append(_list_offsets(cur))
        cur = cur.values
    coords = _coords_from(cur, geo)

    # POINT with struct storage: validity lives on the struct; a null
    # feature's coord slots hold whatever the buffer holds (commonly NaN
    # from the builders, but not guaranteed) — kernels must consult
    # ``valid`` rather than rely on the coord values of null features.
    return GeomView(geo=geo, length=len(arr), coords=coords, offsets=offsets, valid=valid)


def box_view(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None):
    """(mins, maxes, valid) for a geoarrow.box struct array, shape (n, ndim)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ExtensionArray):
        if geo is None:
            geo = GeoType.from_field(pa.field("g", arr.type))
        arr = arr.storage
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    ndim = geo.dimensions.count
    cols = [arr.field(i).to_numpy(zero_copy_only=False) for i in range(2 * ndim)]
    mins = np.column_stack(cols[:ndim])
    maxes = np.column_stack(cols[ndim:])
    valid = None
    if arr.null_count > 0:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
    return mins, maxes, valid


# ------------------------------------------------------------------ build

def build_points(
    coords: np.ndarray, geo: GeoType, mask: np.ndarray | None = None
) -> pa.Array:
    """(n, ndim) float64 → geoarrow.point storage array."""
    storage = geo.storage_type()
    if geo.coord_type == CoordType.INTERLEAVED:
        flat = pa.array(np.ascontiguousarray(coords).reshape(-1), pa.float64())
        return pa.FixedSizeListArray.from_arrays(flat, type=storage)
    arrs = [pa.array(np.ascontiguousarray(coords[:, d]), pa.float64()) for d in range(coords.shape[1])]
    return pa.StructArray.from_arrays(
        arrs,
        fields=[storage.field(i) for i in range(storage.num_fields)],
        mask=pa.array(mask) if mask is not None else None,
    )


def build_nested(
    coords: np.ndarray,
    offsets: list[np.ndarray],
    geo: GeoType,
    mask: np.ndarray | None = None,
) -> pa.Array:
    """coords + per-level offsets → native nested array of ``geo``'s type."""
    storage = geo.storage_type()
    # innermost coord array
    types = [storage]
    for _ in range(len(offsets)):
        types.append(types[-1].value_type)
    coord_storage = types[-1]
    if geo.coord_type == CoordType.INTERLEAVED:
        flat = pa.array(np.ascontiguousarray(coords).reshape(-1), pa.float64())
        cur = pa.FixedSizeListArray.from_arrays(flat, type=coord_storage)
    else:
        cur = pa.StructArray.from_arrays(
            [pa.array(np.ascontiguousarray(coords[:, d]), pa.float64()) for d in range(coords.shape[1])],
            fields=[coord_storage.field(i) for i in range(coord_storage.num_fields)],
        )
    for level in range(len(offsets) - 1, -1, -1):
        m = None
        if level == 0 and mask is not None:
            m = pa.array(mask)
        cur = pa.ListArray.from_arrays(
            pa.array(offsets[level].astype(np.int32), pa.int32()),
            cur,
            type=types[level],
            mask=m,
        )
    return cur


def build_boxes(
    mins: np.ndarray, maxes: np.ndarray, geo: GeoType, mask: np.ndarray | None = None
) -> pa.Array:
    storage = geo.storage_type()
    ndim = geo.dimensions.count
    arrs = [pa.array(np.ascontiguousarray(mins[:, d]), pa.float64()) for d in range(ndim)]
    arrs += [pa.array(np.ascontiguousarray(maxes[:, d]), pa.float64()) for d in range(ndim)]
    return pa.StructArray.from_arrays(
        arrs,
        fields=[storage.field(i) for i in range(2 * ndim)],
        mask=pa.array(mask) if mask is not None else None,
    )
