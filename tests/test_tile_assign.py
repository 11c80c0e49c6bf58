"""Rect–polygon intersection + tile→polygon assignment tests."""

import numpy as np
import pyarrow as pa
import pytest

from georay import cells, generate, ops
from georay.codecs import wkt
from georay.index import PolygonIndex
from georay.types import GeoType


def _index_of(wkts, ids=None):
    nat, t = wkt.decode(pa.array(wkts, pa.string()), GeoType.polygon())
    n = len(wkts)
    tbl = pa.table(
        {"polygon_id": pa.array(ids or list(range(n)), pa.int64())},
        schema=pa.schema([pa.field("polygon_id", pa.int64())]),
    ).append_column(GeoType.polygon().field("geometry"), nat)
    return PolygonIndex.build(tbl, id_col="polygon_id")


def test_intersects_rect_cases():
    idx = _index_of(
        [
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",  # 0: big square
            "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))",  # 1: far away
            "POLYGON ((-5 4, 15 4, 15 6, -5 6, -5 4))",  # 2: horizontal slab
        ]
    )
    # rect A inside polygon 0 (no vertices/edges crossing) → corner-in-poly
    # rect B contains polygon 1 entirely → vertex-in-rect
    # rect C crossed by slab 2 (edges pass through, no vertices inside,
    #   no rect corner inside... corners at y=3..7 — slab covers y 4..6 so
    #   corners NOT in slab; slab vertices x=-5,15 NOT in rect → pure
    #   edge-crossing case)
    rx0 = np.array([2.0, 19.0, 1.0])
    ry0 = np.array([2.0, 19.0, 3.0])
    rx1 = np.array([3.0, 22.0, 2.0])
    ry1 = np.array([3.0, 22.0, 7.0])
    r, p = idx.intersects_rect(rx0, ry0, rx1, ry1)
    pairs = set(zip(r.tolist(), p.tolist()))
    assert (0, 0) in pairs
    assert (1, 1) in pairs
    assert (2, 2) in pairs
    # no false positives
    assert (0, 1) not in pairs and (1, 0) not in pairs
    assert (2, 1) not in pairs


def test_intersects_rect_disjoint():
    idx = _index_of(["POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"])
    r, p = idx.intersects_rect(
        np.array([5.0]), np.array([5.0]), np.array([6.0]), np.array([6.0])
    )
    assert r.size == 0


def test_tile_polygon_assign_consistent_with_pip(ray_session, tmp_path):
    import ray.data as rd

    generate.write_images_dataset(str(tmp_path), 2000, seed=11, rows_per_file=1000)
    polygons = generate.make_polygons_table(200, seed=12)
    zoom = 5
    ds = rd.read_parquet(str(tmp_path))
    ds = ops.add_tile_columns(ds, zoom=zoom)
    assign = ops.tile_polygon_assign(ds, polygons, zoom=zoom)
    assigned = set(
        zip(assign["tile_key"].to_pylist(), assign["polygon_id"].to_pylist())
    )

    # consistency: every (point ∈ polygon) match implies the point's tile
    # is assigned to that polygon
    from georay.joins import pip_join

    inner = pip_join(ds, polygons, mode="inner").take_all()
    for r in inner:
        assert (r["tile_key"], r["polygon_id"]) in assigned, r["image_id"]


def test_tile_bounds_roundtrip():
    tx = np.array([0, 5, 31])
    ty = np.array([0, 7, 31])
    xmin, ymin, xmax, ymax = cells.tile_bounds(tx, ty, 5)
    # center of each tile must map back to the same tile
    cx = (xmin + xmax) / 2
    cy = (ymin + ymax) / 2
    tx2, ty2 = cells.mercator_tile(cx, cy, 5)
    assert np.array_equal(tx, tx2) and np.array_equal(ty, ty2)
    key = cells.tile_key(tx, ty, 5)
    z, bx, by = cells.tile_from_key(key)
    assert np.all(z == 5) and np.array_equal(bx, tx) and np.array_equal(by, ty)
