"""Kernel-oracle fixtures (FIXTURES.md F5): box/box_agg/centroid/unique
types with the reference's null/empty conventions."""

import numpy as np
import pyarrow as pa
import pytest

from georay import kernels
from georay.codecs import native, wkt
from georay.types import Dimensions, EdgeType, GeometryType, GeoType


def _poly(wkts, geo=None):
    arr = pa.array(wkts, pa.string())
    return wkt.decode(arr, geo)


def test_box_null_and_empty_conventions():
    # null→null; EMPTY→(Inf,Inf,-Inf,-Inf)  (src/geoarrow.c:1735-1930)
    nat, t = _poly(
        ["POLYGON ((0 0, 4 0, 4 3, 0 0))", "POLYGON EMPTY", None], GeoType.polygon()
    )
    b = kernels.box(nat, t).to_pylist()
    assert b[0] == {"xmin": 0.0, "ymin": 0.0, "xmax": 4.0, "ymax": 3.0}
    assert b[1] == {
        "xmin": float("inf"),
        "ymin": float("inf"),
        "xmax": float("-inf"),
        "ymax": float("-inf"),
    }
    assert b[2] is None


def test_box_agg_never_null():
    # nulls treated as empty; empty input → Inf box (geoarrow.h:1172-1181)
    nat, t = _poly([None, "POINT EMPTY"], GeoType.point())
    agg = kernels.box_agg_merge([kernels.box_agg_partial(nat, t)])
    assert agg == (float("inf"), float("inf"), float("-inf"), float("-inf"))
    nat2, t2 = _poly(["POINT (2 5)", None], GeoType.point())
    agg2 = kernels.box_agg_merge([kernels.box_agg_partial(nat2, t2)])
    assert agg2 == (2.0, 5.0, 2.0, 5.0)


def test_box_of_box_input():
    storage = GeoType.box().storage_type()
    arr = pa.StructArray.from_arrays(
        [pa.array([0.0]), pa.array([1.0]), pa.array([2.0]), pa.array([3.0])],
        fields=[storage.field(i) for i in range(4)],
    )
    b = kernels.box(arr, GeoType.box()).to_pylist()
    assert b == [{"xmin": 0.0, "ymin": 1.0, "xmax": 2.0, "ymax": 3.0}]


def test_box_planar_only():
    nat, t = _poly(["POINT (0 1)"], GeoType.point())
    with pytest.raises(ValueError):
        kernels.box(nat, t.with_edges(EdgeType.SPHERICAL))


def test_centroid_conventions():
    nat, t = _poly(
        ["LINESTRING (0 0, 2 0, 2 2, 0 2)", "LINESTRING EMPTY", None],
        GeoType.linestring(),
    )
    c = kernels.centroid(nat, t).to_pylist()
    assert c[0] == {"x": 1.0, "y": 1.0}
    assert np.isnan(c[1]["x"]) and np.isnan(c[1]["y"])
    assert c[2] is None


def test_unique_types_box_counts_as_polygon():
    storage = GeoType.box().storage_type()
    arr = pa.StructArray.from_arrays(
        [pa.array([0.0]), pa.array([1.0]), pa.array([2.0]), pa.array([3.0])],
        fields=[storage.field(i) for i in range(4)],
    )
    codes = kernels.unique_types_finish(kernels.unique_types_partial(arr, GeoType.box()))
    assert codes == [3]  # box visits as POLYGON (src/geoarrow.c:2960-3028)


def test_unique_types_degenerate_box_is_empty():
    # min>max box = empty polygon → excluded (src/geoarrow.c:2986-3016)
    storage = GeoType.box().storage_type()
    arr = pa.StructArray.from_arrays(
        [pa.array([5.0]), pa.array([5.0]), pa.array([2.0]), pa.array([3.0])],
        fields=[storage.field(i) for i in range(4)],
    )
    assert kernels.unique_types_partial(arr, GeoType.box()) == 0


def test_unique_types_native_point_nan_still_counts():
    # the kernel does NOT apply the all-NaN-empty convention to native
    # points (comment src/geoarrow.c:1616-1628)
    pts = native.build_points(np.array([[np.nan, np.nan]]), GeoType.point())
    codes = kernels.unique_types_finish(
        kernels.unique_types_partial(pts, GeoType.point())
    )
    assert codes == [1]


def test_unique_types_z_codes():
    nat, t = _poly(["POINT Z (0 1 2)"], GeoType.point(dimensions=Dimensions.XYZ))
    codes = kernels.unique_types_finish(kernels.unique_types_partial(nat, t))
    assert codes == [1001]


def test_area_with_hole_and_empty():
    nat, t = _poly(
        [
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))",
            "POLYGON EMPTY",
            None,
            "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))",
        ],
        GeoType.polygon(),
    )
    assert kernels.area(nat, t).to_pylist() == [12.0, 0.0, None, 2.0]
    assert kernels.length(nat, t).to_pylist() == [24.0, 0.0, None, 6.0]


def test_length_linestring_and_multipolygon_area():
    nat, t = _poly(
        ["LINESTRING (0 0, 3 4, 3 8)", "LINESTRING EMPTY"], GeoType.linestring()
    )
    assert kernels.length(nat, t).to_pylist() == [9.0, 0.0]
    nat2, t2 = _poly(
        [
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"
        ],
        GeoType.multipolygon(),
    )
    assert kernels.area(nat2, t2).to_pylist() == [5.0]
    assert kernels.area(
        _poly(["POINT (3 4)"], GeoType.point())[0], GeoType.point()
    ).to_pylist() == [0.0]


def test_box_multipolygon_spanning_rings():
    nat, t = _poly(
        ["MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 9 5, 9 9, 5 5)))"],
        GeoType.multipolygon(),
    )
    b = kernels.box(nat, t).to_pylist()
    assert b[0] == {"xmin": 0.0, "ymin": 0.0, "xmax": 9.0, "ymax": 9.0}


def test_area_winding_independent():
    # a hole wound the SAME way as the shell must still subtract
    # (standard WKB/WKT does not constrain winding): shell 10x10=100,
    # hole 4x4=16 -> 84, regardless of either ring's orientation
    same_winding = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))"
    )
    opp_winding = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 6, 6 6, 6 2, 2 2))"
    )
    cw_shell = (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2))"
    )
    nat, t = _poly([same_winding, opp_winding, cw_shell], GeoType.polygon())
    assert kernels.area(nat, t).to_pylist() == [84.0, 84.0, 84.0]
    # multipolygon: each polygon's first ring is its shell
    mp = (
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 6 2, 6 6, 2 6, 2 2)),"
        " ((20 20, 22 20, 22 22, 20 22, 20 20)))"
    )
    nat2, t2 = _poly([mp], GeoType.multipolygon())
    assert kernels.area(nat2, t2).to_pylist() == [88.0]


def test_length_multipoint_is_zero():
    # length contract: 0 for points — consecutive points of a MULTIPOINT
    # are not linestring segments
    nat, t = _poly(
        ["MULTIPOINT ((0 0), (3 4))", "MULTIPOINT EMPTY", None],
        GeoType.multipoint(),
    )
    assert kernels.length(nat, t).to_pylist() == [0.0, 0.0, None]


def test_haversine_known_values():
    import numpy as np

    from georay.kernels import haversine_km

    # London → Paris ≈ 343.5 km; equator degree ≈ 111.19 km; zero distance
    d = haversine_km(
        np.array([-0.1278, 0.0, 10.0]),
        np.array([51.5074, 0.0, 20.0]),
        np.array([2.3522, 1.0, 10.0]),
        np.array([48.8566, 0.0, 20.0]),
    )
    assert 342.0 < d[0] < 345.0
    assert abs(d[1] - 111.1950) < 0.01
    assert d[2] == 0.0
    # antipodal clamp stays finite
    a = haversine_km(np.array([0.0]), np.array([0.0]), 180.0, 0.0)
    assert abs(a[0] - np.pi * 6371.0088) < 0.5
