"""ISO WKB codec: binary arrays ↔ GeoArrow-native arrays.

Semantics pinned to the reference:
- both byte orders on read (byte-swap when first byte != 0x01,
  /root/reference/src/geoarrow.c:4508, 4525, 4631)
- little-endian on write with ISO codes ``(dims-1)*1000 + geometry_type``
  (/root/reference/src/geoarrow.c:4770-4995, native endian at 4776)
- POINT EMPTY ⇔ all-NaN coordinates (the only ISO-WKB representation)
- empty LINESTRING/POLYGON/MULTI* ⇔ zero element count

The decoder parses each feature into a tiny geometry-node tree (the
columnar analogue of the reference's GeoArrowGeometry scalar tree,
src/geoarrow.c:3162-3745) and a builder assembles target-typed native
arrays; an all-POINT fast path decodes whole batches with one
``np.frombuffer``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from georay.codecs import native
from georay.kernels import infer_type_from_codes
from georay.types import CoordType, Dimensions, GeometryType, GeoType

_NDIM = {0: 2, 1: 3, 2: 3, 3: 4}  # wkb dims-code → coord count
_DIMS_ENUM = {0: Dimensions.XY, 1: Dimensions.XYZ, 2: Dimensions.XYM, 3: Dimensions.XYZM}
_DIMCODE_OF = {Dimensions.XY: 0, Dimensions.XYZ: 1, Dimensions.XYM: 2, Dimensions.XYZM: 3}


class Node:
    __slots__ = ("geom", "dims", "coords", "children", "rings")

    def __init__(self, geom, dims, coords=None, children=None, rings=None):
        self.geom = geom  # GeometryType
        self.dims = dims  # Dimensions
        self.coords = coords  # (n, ndim) for point/linestring
        self.children = children  # list[Node] for multi/collection
        self.rings = rings  # list[(n, ndim)] for polygon


# ------------------------------------------------------------------ parse

def _parse(buf: memoryview, pos: int) -> tuple[Node, int]:
    order = buf[pos]
    fmt_u32 = "<I" if order == 1 else ">I"
    fmt_f8 = "<f8" if order == 1 else ">f8"
    (code,) = struct.unpack_from(fmt_u32, buf, pos + 1)
    pos += 5
    # EWKB high bits (reference accepts ISO *or* EWKB — geoarrow.h:1424,
    # flag handling src/geoarrow.c:4573-4589): Z/M flags, embedded SRID
    # read-and-ignored ("hard to work around if a user somehow has
    # embedded srid but still wants the data").
    has_z = bool(code & 0x80000000)
    has_m = bool(code & 0x40000000)
    if code & 0x20000000:
        pos += 4  # skip SRID
    code &= 0xFFFF
    # ISO X000 thousands (composable with EWKB flags, as the reference)
    if code >= 3000:
        code -= 3000
        has_z = has_m = True
    elif code >= 2000:
        code -= 2000
        has_m = True
    elif code >= 1000:
        code -= 1000
        has_z = True
    geom = GeometryType(code)
    dimcode = (2 if has_m else 0) + (1 if has_z else 0)
    ndim = _NDIM[dimcode]
    dims = _DIMS_ENUM[dimcode]
    if geom == GeometryType.POINT:
        c = np.frombuffer(buf, dtype=fmt_f8, count=ndim, offset=pos).astype(np.float64)
        return Node(geom, dims, coords=c.reshape(1, ndim)), pos + 8 * ndim
    if geom == GeometryType.LINESTRING:
        (n,) = struct.unpack_from(fmt_u32, buf, pos)
        pos += 4
        c = np.frombuffer(buf, dtype=fmt_f8, count=n * ndim, offset=pos).astype(np.float64)
        return Node(geom, dims, coords=c.reshape(n, ndim)), pos + 8 * ndim * n
    if geom == GeometryType.POLYGON:
        (nr,) = struct.unpack_from(fmt_u32, buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt_u32, buf, pos)
            pos += 4
            c = np.frombuffer(buf, dtype=fmt_f8, count=n * ndim, offset=pos).astype(np.float64)
            rings.append(c.reshape(n, ndim))
            pos += 8 * ndim * n
        return Node(geom, dims, rings=rings), pos
    if geom in (
        GeometryType.MULTIPOINT,
        GeometryType.MULTILINESTRING,
        GeometryType.MULTIPOLYGON,
        GeometryType.GEOMETRYCOLLECTION,
    ):
        (n,) = struct.unpack_from(fmt_u32, buf, pos)
        pos += 4
        children = []
        for _ in range(n):
            child, pos = _parse(buf, pos)
            children.append(child)
        return Node(geom, dims, children=children), pos
    raise ValueError(f"unsupported WKB geometry type {geom}")


def parse_feature(data: bytes) -> Node:
    node, pos = _parse(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing {len(data) - pos} bytes after WKB geometry")
    return node


def _node_first_coords(node: Node) -> bool:
    """Does the feature own ≥1 coordinate? (EMPTY exclusion for the
    unique-types kernel; native POINT NaNs still count, matching
    src/geoarrow.c:1616-1628 — but WKB POINT EMPTY *is* all-NaN and the
    reference's WKB reader emits its coord, so it counts as POINT.)"""
    if node.coords is not None:
        return node.coords.shape[0] > 0
    if node.rings is not None:
        return any(r.shape[0] > 0 for r in node.rings)
    return any(_node_first_coords(c) for c in node.children)


def _binary_values(arr: pa.Array):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _buffer_views(arr: pa.Array):
    """(offsets int64, values uint8, valid bool|None) raw views of a
    plain/large binary array."""
    arr = _binary_values(arr)
    if pa.types.is_large_binary(arr.type):
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    else:
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32).astype(np.int64)
    offs = offs[arr.offset : arr.offset + len(arr) + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    valid = None
    if arr.null_count > 0:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
    return offs, buf, valid


def _u32_at(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized little-endian uint32 gather at byte positions."""
    return (
        buf[pos].astype(np.uint32)
        | (buf[pos + 1].astype(np.uint32) << 8)
        | (buf[pos + 2].astype(np.uint32) << 16)
        | (buf[pos + 3].astype(np.uint32) << 24)
    )


def validate(arr) -> int:
    """Structural validation of a WKB batch (visit_void_agg semantics:
    full structural walk, raise on malformed, src/geoarrow.c:1528-1540).

    Vectorized fast lane: when every non-null feature is little-endian
    with one shared geometry code whose length arithmetic is closed-form
    (POINT / LINESTRING / MULTIPOINT-of-points / POLYGON), lengths and
    element counts are checked with numpy over the raw offsets+values
    buffers — no per-feature parse. Mixed, big-endian, or nested
    collection batches fall back to the exact per-feature parser.

    Returns the count of valid (non-null) features.
    """
    arr = _binary_values(arr)
    offs, buf, valid = _buffer_views(arr)
    n = len(arr)
    if n == 0:
        return 0
    lens = np.diff(offs)
    live = np.ones(n, dtype=bool) if valid is None else valid.copy()
    n_valid = int(live.sum())
    if n_valid == 0:
        return 0
    starts = offs[:-1][live]
    flens = lens[live]
    if np.any(flens < 5):
        raise ValueError("WKB feature shorter than its header")
    le = buf[starts] == 1
    codes = _u32_at(buf, starts + 1)
    if bool(np.all(le)) and codes.min() == codes.max():
        code = int(codes[0])
        geom = code % 1000
        ndim = {0: 2, 1: 3, 2: 3, 3: 4}.get(code // 1000, -1)
        if ndim > 0:
            sz = 8 * ndim
            if geom == 1:  # POINT: fixed length
                if np.all(flens == 5 + sz):
                    return n_valid
            elif geom == 2:  # LINESTRING: 9 + n*sz
                cnt = _u32_at(buf, starts + 5).astype(np.int64)
                if np.all(flens == 9 + cnt * sz):
                    return n_valid
            elif geom == 4:  # MULTIPOINT of child points: 9 + n*(5+sz)
                cnt = _u32_at(buf, starts + 5).astype(np.int64)
                if np.all(flens == 9 + cnt * (5 + sz)):
                    # check EVERY child header (ragged expansion)
                    from georay.index import _ragged_ranges

                    owner, within = _ragged_ranges(cnt)
                    cpos = np.repeat(starts, cnt) + 9 + within * (5 + sz)
                    if np.all(buf[cpos] == 1) and np.all(
                        _u32_at(buf, cpos + 1) == code - 3
                    ):
                        return n_valid
            elif geom == 3:  # POLYGON: iterate rings in lockstep
                nrings = _u32_at(buf, starts + 5).astype(np.int64)
                pos = starts + 9
                remaining = nrings.copy()
                ends = starts + flens
                ok = True
                while True:
                    act = remaining > 0
                    if not np.any(act):
                        break
                    if np.any(pos[act] + 4 > ends[act]):
                        ok = False
                        break
                    rc = _u32_at(buf, pos[act]).astype(np.int64)
                    pos[act] += 4 + rc * sz
                    remaining[act] -= 1
                if ok and np.all(pos == ends):
                    return n_valid
    # exact fallback: full per-feature parse (raises on malformed)
    for v in arr:
        if v.is_valid:
            parse_feature(v.as_py())
    return n_valid


def unique_types_mask(arr) -> int:
    """Per-batch uint64 bitmask for unique_geometry_types_agg.

    Vectorized over the raw offsets+values buffers for little-endian
    POINT / LINESTRING / POLYGON features (type+dims from the header
    gather, non-emptiness from the count field); big-endian, multi, and
    collection rows fall back to the exact per-feature parser. Matches
    the per-row semantics of src/geoarrow.c:1616-1628: WKB POINT EMPTY
    (all-NaN coord) still counts, coordinate-less features do not.
    """
    arr = _binary_values(arr)
    offs, buf, valid = _buffer_views(arr)
    n = len(arr)
    if n == 0:
        return 0
    live = np.ones(n, dtype=bool) if valid is None else valid
    if not np.any(live):
        return 0
    starts = offs[:-1][live]
    lens = np.diff(offs)[live]
    if np.any(lens < 5):
        raise ValueError("WKB feature shorter than its header")
    le = buf[starts] == 1
    codes = np.where(le, _u32_at(buf, starts + 1), np.uint32(0))
    geom = codes % 1000
    dcode = codes // 1000
    fast = le & (geom >= 1) & (geom <= 3) & (dcode <= 3)
    counted = np.zeros(starts.shape[0], dtype=bool)
    # POINT: the reference's WKB reader emits the (possibly all-NaN) coord,
    # so POINT always counts (see _node_first_coords docstring).
    counted |= fast & (geom == 1)
    ls = fast & (geom == 2)
    if np.any(ls):
        counted[ls] = _u32_at(buf, starts[ls] + 5) > 0
    pg = fast & (geom == 3)
    if np.any(pg):
        nr = _u32_at(buf, starts[pg] + 5)
        first_ring = np.zeros(nr.shape[0], dtype=np.uint32)
        has_ring = nr > 0
        first_ring[has_ring] = _u32_at(buf, starts[pg][has_ring] + 9)
        counted[pg] = first_ring > 0
        # >0 rings but empty first ring: later rings may hold coords —
        # too rare to vectorize, resolve exactly
        fast[np.flatnonzero(pg)[has_ring & (first_ring == 0)]] = False
    mask = 0
    hit = fast & counted
    if np.any(hit):
        bits = (dcode[hit].astype(np.int64) + 1) * 8 + geom[hit].astype(np.int64)
        for b in np.unique(bits):
            mask |= 1 << int(b)
    if not np.all(fast):
        idx = np.flatnonzero(live)[~fast]
        for i in idx:
            node = parse_feature(arr[int(i)].as_py())
            if _node_first_coords(node):
                mask |= 1 << (int(node.dims) * 8 + int(node.geom))
    return mask


# ------------------------------------------------------------------ build

def _pad_coords(c: np.ndarray, src_dims: Dimensions, dst_dims: Dimensions) -> np.ndarray:
    """Reproject coord columns between dimension sets; missing → NaN
    (reference fill rule src/r-sf-compat.c:86-96)."""
    if src_dims == dst_dims:
        return c
    src = src_dims.letters
    dst = dst_dims.letters
    out = np.full((c.shape[0], len(dst)), np.nan)
    for j, letter in enumerate(dst):
        if letter in src:
            out[:, j] = c[:, src.index(letter)]
    return out


def build_native(
    nodes: list[Node | None], target: GeoType, crs_like: GeoType | None = None
) -> pa.Array:
    """Assemble parsed features into the target native layout, applying the
    reference's cast semantics (POINT under MULTIPOINT target, etc.)."""
    gt = target.geometry_type
    dims = target.dimensions
    nd = dims.count
    n = len(nodes)
    mask = np.zeros(n, dtype=bool)

    def feature_parts(node: Node) -> list[np.ndarray]:
        """List of coord runs (one per ring/linestring element)."""
        if node.coords is not None:
            return [node.coords]
        if node.rings is not None:
            return list(node.rings)
        out = []
        for ch in node.children:
            out.extend(feature_parts(ch))
        return out

    if gt == GeometryType.POINT:
        coords = np.full((n, nd), np.nan)
        for i, node in enumerate(nodes):
            if node is None:
                mask[i] = True
                continue
            if node.geom != GeometryType.POINT:
                raise ValueError(f"cannot cast {node.geom.name} to POINT")
            if node.coords.shape[0]:
                coords[i] = _pad_coords(node.coords, node.dims, dims)[0]
        return native.build_points(coords, target, mask=mask if mask.any() else None)

    chunks: list[np.ndarray] = []
    if gt in (GeometryType.LINESTRING, GeometryType.MULTIPOINT):
        offs = np.zeros(n + 1, dtype=np.int64)
        for i, node in enumerate(nodes):
            cnt = 0
            if node is None:
                mask[i] = True
            else:
                if gt == GeometryType.LINESTRING and node.geom != GeometryType.LINESTRING:
                    raise ValueError(f"cannot cast {node.geom.name} to LINESTRING")
                if gt == GeometryType.MULTIPOINT and node.geom not in (
                    GeometryType.POINT,
                    GeometryType.MULTIPOINT,
                ):
                    raise ValueError(f"cannot cast {node.geom.name} to MULTIPOINT")
                parts = feature_parts(node)
                for p in parts:
                    if node.geom == GeometryType.POINT and np.all(np.isnan(p)):
                        continue  # POINT EMPTY → MULTIPOINT with zero points
                    if p.shape[0]:
                        chunks.append(_pad_coords(p, node.dims, dims))
                        cnt += p.shape[0]
            offs[i + 1] = offs[i] + cnt
        coords = np.concatenate(chunks) if chunks else np.empty((0, nd))
        return native.build_nested(coords, [offs], target, mask=mask if mask.any() else None)

    if gt in (GeometryType.POLYGON, GeometryType.MULTILINESTRING):
        outer = np.zeros(n + 1, dtype=np.int64)
        inner = [0]
        for i, node in enumerate(nodes):
            parts_n = 0
            if node is None:
                mask[i] = True
            else:
                if gt == GeometryType.POLYGON and node.geom != GeometryType.POLYGON:
                    raise ValueError(f"cannot cast {node.geom.name} to POLYGON")
                if gt == GeometryType.MULTILINESTRING and node.geom not in (
                    GeometryType.LINESTRING,
                    GeometryType.MULTILINESTRING,
                ):
                    raise ValueError(f"cannot cast {node.geom.name} to MULTILINESTRING")
                for p in feature_parts(node):
                    chunks.append(_pad_coords(p, node.dims, dims))
                    inner.append(inner[-1] + p.shape[0])
                    parts_n += 1
            outer[i + 1] = outer[i] + parts_n
        coords = np.concatenate(chunks) if chunks else np.empty((0, nd))
        return native.build_nested(
            coords,
            [outer, np.asarray(inner, dtype=np.int64)],
            target,
            mask=mask if mask.any() else None,
        )

    if gt == GeometryType.MULTIPOLYGON:
        o0 = np.zeros(n + 1, dtype=np.int64)
        o1 = [0]
        o2 = [0]
        for i, node in enumerate(nodes):
            polys = 0
            if node is None:
                mask[i] = True
            else:
                if node.geom == GeometryType.POLYGON:
                    poly_nodes = [node]
                elif node.geom == GeometryType.MULTIPOLYGON:
                    poly_nodes = node.children
                else:
                    raise ValueError(f"cannot cast {node.geom.name} to MULTIPOLYGON")
                for p in poly_nodes:
                    for r in p.rings:
                        chunks.append(_pad_coords(r, p.dims, dims))
                        o2.append(o2[-1] + r.shape[0])
                    o1.append(o1[-1] + len(p.rings))
                    polys += 1
            o0[i + 1] = o0[i] + polys
        coords = np.concatenate(chunks) if chunks else np.empty((0, nd))
        return native.build_nested(
            coords,
            [o0, np.asarray(o1, dtype=np.int64), np.asarray(o2, dtype=np.int64)],
            target,
            mask=mask if mask.any() else None,
        )

    raise ValueError(f"unsupported target {gt}")


# ----------------------------------------------------------------- decode

def decode(
    arr: pa.Array | pa.ChunkedArray, target: GeoType | None = None
) -> tuple[pa.Array, GeoType]:
    """WKB binary array → native array (+ its GeoType).

    Without a target, infers the narrowest type via the unique-types
    kernel + promotion rules (R/infer-default.R:85-152). Falls back to
    returning the input when inference says WKB (heterogeneous input).
    """
    arr = _binary_values(arr)

    if target is None:
        from georay.kernels import unique_types_finish

        codes = unique_types_finish(unique_types_mask(arr))
        t = infer_type_from_codes(codes) if codes else GeoType.wkb()
        if t.serialized:  # heterogeneous — stays WKB
            return arr, GeoType.wkb()
        target = t

    # fast path: every buffer is exactly a little-endian simple point
    # (plain binary only — large_binary has int64 offsets)
    if (
        target.geometry_type == GeometryType.POINT
        and arr.null_count == 0
        and pa.types.is_binary(arr.type)
    ):
        nd = target.dimensions.count
        fixed = 5 + 8 * nd
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        if len(arr) and np.all(np.diff(offs) == fixed):
            buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            start = offs[0]
            flat = buf[start : start + fixed * len(arr)].reshape(len(arr), fixed)
            code = int(Dimensions(target.dimensions) - 1) * 1000 + 1
            if np.all(flat[:, 0] == 1) and np.all(
                flat[:, 1:5] == np.frombuffer(struct.pack("<I", code), np.uint8)
            ):
                coords = flat[:, 5:].copy().view("<f8").reshape(len(arr), nd)
                return native.build_points(coords, target), target

    nodes = [
        parse_feature(v.as_py()) if v.is_valid else None for v in arr
    ]
    return build_native(nodes, target), target


# ----------------------------------------------------------------- encode

def _code(geom: GeometryType, dims: Dimensions) -> int:
    return _DIMCODE_OF[dims] * 1000 + int(geom)


def encode(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None) -> pa.Array:
    """Native array → little-endian ISO WKB binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    gt = geo.geometry_type
    dims = geo.dimensions
    nd = dims.count

    if gt == GeometryType.POINT:
        v = native.view(arr, geo)
        n = v.length
        fixed = 5 + 8 * nd
        out = np.empty((n, fixed), dtype=np.uint8)
        out[:, 0] = 1
        out[:, 1:5] = np.frombuffer(struct.pack("<I", _code(gt, dims)), np.uint8)
        out[:, 5:] = v.coords.astype("<f8").view(np.uint8).reshape(n, 8 * nd)
        flat = out.reshape(-1)
        offsets = np.arange(0, (n + 1) * fixed, fixed, dtype=np.int32)
        mask = None
        if v.valid is not None:
            mask = pa.array(~v.valid)
        values = pa.py_buffer(flat.tobytes())
        res = pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), values]
        )
        if mask is not None:
            # rebuild with validity (from_buffers null bitmap juggling is
            # fiddly — take the compact route)
            res = pa.array(
                [res[i].as_py() if v.valid[i] else None for i in range(n)], pa.binary()
            )
        return res

    v = native.view(arr, geo)
    header = struct.pack("<B", 1)
    bufs: list[bytes | None] = []

    def coords_bytes(c: np.ndarray) -> bytes:
        return np.ascontiguousarray(c, dtype="<f8").tobytes()

    if gt in (GeometryType.LINESTRING, GeometryType.MULTIPOINT):
        o = v.offsets[0]
        code = struct.pack("<I", _code(gt, dims))
        pt_hdr = header + struct.pack("<I", _code(GeometryType.POINT, dims))
        for i in range(v.length):
            if v.valid is not None and not v.valid[i]:
                bufs.append(None)
                continue
            c = v.coords[o[i] : o[i + 1]]
            if gt == GeometryType.LINESTRING:
                bufs.append(header + code + struct.pack("<I", c.shape[0]) + coords_bytes(c))
            else:
                body = b"".join(pt_hdr + coords_bytes(c[j : j + 1]) for j in range(c.shape[0]))
                bufs.append(header + code + struct.pack("<I", c.shape[0]) + body)
    elif gt in (GeometryType.POLYGON, GeometryType.MULTILINESTRING):
        o0, o1 = v.offsets
        code = struct.pack("<I", _code(gt, dims))
        ls_code = struct.pack("<I", _code(GeometryType.LINESTRING, dims))
        for i in range(v.length):
            if v.valid is not None and not v.valid[i]:
                bufs.append(None)
                continue
            parts = []
            for r in range(o0[i], o0[i + 1]):
                c = v.coords[o1[r] : o1[r + 1]]
                if gt == GeometryType.POLYGON:
                    parts.append(struct.pack("<I", c.shape[0]) + coords_bytes(c))
                else:
                    parts.append(
                        header + ls_code + struct.pack("<I", c.shape[0]) + coords_bytes(c)
                    )
            bufs.append(
                header + code + struct.pack("<I", o0[i + 1] - o0[i]) + b"".join(parts)
            )
    elif gt == GeometryType.MULTIPOLYGON:
        o0, o1, o2 = v.offsets
        code = struct.pack("<I", _code(gt, dims))
        poly_code = struct.pack("<I", _code(GeometryType.POLYGON, dims))
        for i in range(v.length):
            if v.valid is not None and not v.valid[i]:
                bufs.append(None)
                continue
            polys = []
            for p in range(o0[i], o0[i + 1]):
                rings = []
                for r in range(o1[p], o1[p + 1]):
                    c = v.coords[o2[r] : o2[r + 1]]
                    rings.append(struct.pack("<I", c.shape[0]) + coords_bytes(c))
                polys.append(
                    header + poly_code + struct.pack("<I", o1[p + 1] - o1[p]) + b"".join(rings)
                )
            bufs.append(
                header + code + struct.pack("<I", o0[i + 1] - o0[i]) + b"".join(polys)
            )
    else:
        raise ValueError(f"unsupported geometry type for WKB encode: {gt}")

    return pa.array(bufs, pa.binary())
