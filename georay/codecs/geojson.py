"""GeoJSON (RFC 7946) text codec over the shared geometry ``Node`` tree.

The reference reaches GeoJSON interop through sf (``R/pkg-sf.R``); this
engine serializes the same tree its WKT/WKB codecs share, so
encode → decode is bit-lossless (JSON numbers carry the full shortest
round-trip form — WKT's 16-decimal reference quantization does not
apply). RFC 7946 constraints honored:

- no M dimension — XYM/XYZM input raises (GeoJSON coordinates are
  [lon, lat(, alt)] only);
- EMPTY geometries serialize as empty ``coordinates`` arrays (the
  spec's representation of emptiness); an all-NaN POINT (the engine's
  empty-point convention, src/r-wk-handle-stream.cc:195-222) becomes
  ``"coordinates":[]``;
- non-finite ordinates raise — JSON has no NaN/Infinity literal.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from georay.codecs.wkb import Node, build_native
from georay.codecs.wkt import nodes_from_native
from georay.types import Dimensions, GeometryType, GeoType

_GJ_NAME = {
    GeometryType.POINT: "Point",
    GeometryType.LINESTRING: "LineString",
    GeometryType.POLYGON: "Polygon",
    GeometryType.MULTIPOINT: "MultiPoint",
    GeometryType.MULTILINESTRING: "MultiLineString",
    GeometryType.MULTIPOLYGON: "MultiPolygon",
    GeometryType.GEOMETRYCOLLECTION: "GeometryCollection",
}
_NAME_GJ = {v: k for k, v in _GJ_NAME.items()}


def _pos(row: np.ndarray, precision: int) -> str:
    # precision kept for signature symmetry with the WKT writer; JSON
    # numbers are always the SHORTEST round-trip decimal (Python repr ==
    # Ryu d2d), so decode(encode(x)) is bit-lossless — unlike WKT's
    # reference-mandated 16-decimal quantization.
    if not np.all(np.isfinite(row)):
        raise ValueError("geojson: non-finite ordinate (JSON has no NaN/Inf)")
    return "[" + ",".join(repr(float(v)) for v in row) + "]"


def _seq(c: np.ndarray, precision: int) -> str:
    return "[" + ",".join(_pos(r, precision) for r in c) + "]"


def _coords_json(node: Node, precision: int) -> str:
    g = node.geom
    if g == GeometryType.POINT:
        if node.coords.shape[0] == 0 or np.all(np.isnan(node.coords)):
            return "[]"
        return _pos(node.coords[0], precision)
    if g == GeometryType.LINESTRING:
        return _seq(node.coords, precision)
    if g == GeometryType.POLYGON:
        return "[" + ",".join(_seq(r, precision) for r in (node.rings or [])) + "]"
    if g == GeometryType.MULTIPOINT:
        parts = []
        for ch in node.children or []:
            if ch.coords.shape[0] == 0 or np.all(np.isnan(ch.coords)):
                parts.append("[]")
            else:
                parts.append(_pos(ch.coords[0], precision))
        return "[" + ",".join(parts) + "]"
    if g == GeometryType.MULTILINESTRING:
        return "[" + ",".join(
            _seq(ch.coords, precision) for ch in (node.children or [])
        ) + "]"
    if g == GeometryType.MULTIPOLYGON:
        return "[" + ",".join(
            "[" + ",".join(_seq(r, precision) for r in (ch.rings or [])) + "]"
            for ch in (node.children or [])
        ) + "]"
    raise ValueError(f"geojson: cannot write {g}")


def write_node(node: Node, precision: int = 16) -> str:
    if node.dims in (Dimensions.XYM, Dimensions.XYZM):
        raise ValueError("geojson: M dimension is not representable (RFC 7946)")
    if node.geom == GeometryType.GEOMETRYCOLLECTION:
        body = ",".join(write_node(ch, precision) for ch in (node.children or []))
        return f'{{"type":"GeometryCollection","geometries":[{body}]}}'
    name = _GJ_NAME[node.geom]
    return f'{{"type":"{name}","coordinates":{_coords_json(node, precision)}}}'


def encode(
    arr: pa.Array | pa.ChunkedArray, geo: GeoType, precision: int = 16
) -> pa.Array:
    """Native geoarrow column → GeoJSON geometry strings (one JSON
    object per feature; nulls stay null)."""
    nodes = nodes_from_native(arr, geo)
    return pa.array(
        [None if nd is None else write_node(nd, precision) for nd in nodes],
        pa.string(),
    )


def _ndim_of(obj, default: int = 2) -> int:
    # deepest position length decides XY vs XYZ
    while isinstance(obj, list) and obj and isinstance(obj[0], list):
        obj = obj[0]
    if isinstance(obj, list) and obj:
        return len(obj)
    return default


def _coords_arr(seq, ndim: int) -> np.ndarray:
    a = np.asarray(seq, np.float64)
    if a.size == 0:
        return np.empty((0, ndim), np.float64)
    return a.reshape(-1, ndim)


def _node_from_obj(obj: dict) -> Node:
    t = obj["type"]
    if t == "GeometryCollection":
        children = [_node_from_obj(g) for g in obj["geometries"]]
        dims = children[0].dims if children else Dimensions.XY
        return Node(GeometryType.GEOMETRYCOLLECTION, dims, children=children)
    g = _NAME_GJ[t]
    c = obj["coordinates"]
    ndim = _ndim_of(c)
    if ndim not in (2, 3):
        raise ValueError(f"geojson: position length {ndim}")
    dims = Dimensions.XY if ndim == 2 else Dimensions.XYZ
    if g == GeometryType.POINT:
        if len(c) == 0:  # empty point -> engine all-NaN convention
            return Node(g, dims, coords=np.full((1, ndim), np.nan))
        return Node(g, dims, coords=_coords_arr([c], ndim))
    if g == GeometryType.LINESTRING:
        return Node(g, dims, coords=_coords_arr(c, ndim))
    if g == GeometryType.POLYGON:
        return Node(g, dims, rings=[_coords_arr(r, ndim) for r in c])
    if g == GeometryType.MULTIPOINT:
        return Node(
            g, dims,
            children=[
                Node(
                    GeometryType.POINT, dims,
                    coords=(
                        np.full((1, ndim), np.nan) if len(p) == 0
                        else _coords_arr([p], ndim)
                    ),
                )
                for p in c
            ],
        )
    if g == GeometryType.MULTILINESTRING:
        return Node(
            g, dims,
            children=[
                Node(GeometryType.LINESTRING, dims, coords=_coords_arr(l, ndim))
                for l in c
            ],
        )
    if g == GeometryType.MULTIPOLYGON:
        return Node(
            g, dims,
            children=[
                Node(
                    GeometryType.POLYGON, dims,
                    rings=[_coords_arr(r, ndim) for r in p],
                )
                for p in c
            ],
        )
    raise ValueError(f"geojson: cannot read {t}")


def decode(
    arr: pa.Array | pa.ChunkedArray, target: GeoType
) -> pa.Array:
    """GeoJSON geometry strings → native geoarrow column of ``target``
    type (nulls stay null)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nodes = [
        _node_from_obj(json.loads(v.as_py())) if v.is_valid else None
        for v in arr
    ]
    return build_native(nodes, target)
