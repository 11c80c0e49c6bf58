"""vctr-level Dataset ops: crs get/set, union common-type resolution,
WKT preview column, cast matrix, tile assembly, extension protocol —
mirroring /root/reference/tests/testthat/test-vctr.R semantics."""

import numpy as np
import pyarrow as pa
import pytest

from georay import generate, kernels, ops
from georay.codecs import native
from georay.types import CoordType, Dimensions, GeometryType, GeoType


@pytest.fixture(scope="module")
def points_ds(ray_session):
    import ray.data as rd

    t = generate.make_images_table(500, seed=3)
    return rd.from_arrow(t.select(["image_id", "geotag"]))


def test_set_get_crs(points_ds):
    crs, crs_type, edges = ops.get_crs(points_ds, "geotag")
    assert crs == "OGC:CRS84"
    ds2 = ops.set_crs(points_ds, "geotag", "EPSG:3857", edges="spherical")
    crs2, _, edges2 = ops.get_crs(ds2, "geotag")
    assert crs2 == "EPSG:3857"
    assert edges2.name == "SPHERICAL"
    # data untouched
    assert ds2.count() == 500


def test_union_geo_same_type(points_ds, ray_session):
    out = ops.union_geo([points_ds, points_ds], col="geotag")
    assert out.count() == 1000
    t = GeoType.from_field(out.schema().base_schema.field("geotag"))
    assert t.geometry_type == GeometryType.POINT


def test_union_geo_mixed_falls_back_to_wkb(points_ds, ray_session):
    import ray.data as rd

    polys = generate.make_polygons_table(50, seed=4)
    poly_ds = rd.from_arrow(
        pa.table(
            {"image_id": polys["polygon_id"], "geotag": polys["geometry"]},
            schema=pa.schema(
                [
                    pa.field("image_id", pa.string()),
                    GeoType.polygon(crs="OGC:CRS84").field("geotag"),
                ]
            ),
        )
    )
    out = ops.union_geo([points_ds, poly_ds], col="geotag")
    assert out.count() == 550
    t = GeoType.from_field(out.schema().base_schema.field("geotag"))
    assert t.serialized  # WKB fallback (R/vctr.R:92-96)


def test_add_wkt_column(points_ds):
    out = ops.add_wkt_column(points_ds, "geotag", precision=3).take(5)
    for r in out:
        assert r["wkt"] is None or r["wkt"].startswith("POINT")


def test_cast_matrix_dims_and_coord_type():
    pts = native.build_points(np.array([[1.0, 2.0], [3.0, 4.0]]), GeoType.point())
    # XY → XYZ pads NaN (src/r-sf-compat.c:86-96 rule)
    z = kernels.cast(pts, GeoType.point(dimensions=Dimensions.XYZ))
    v = native.view(z, GeoType.point(dimensions=Dimensions.XYZ))
    assert v.coords.shape == (2, 3)
    assert np.all(np.isnan(v.coords[:, 2]))
    # XYZ → XY drops z
    back = kernels.cast(z, GeoType.point(), GeoType.point(dimensions=Dimensions.XYZ))
    vb = native.view(back, GeoType.point())
    assert np.array_equal(vb.coords, [[1.0, 2.0], [3.0, 4.0]])
    # SEPARATE → INTERLEAVED
    il = kernels.cast(pts, GeoType.point(coord_type=CoordType.INTERLEAVED))
    vi = native.view(il, GeoType.point(coord_type=CoordType.INTERLEAVED))
    assert np.array_equal(vi.coords, [[1.0, 2.0], [3.0, 4.0]])
    # POINT → MULTIPOINT promotion
    mp = kernels.cast(pts, GeoType.multipoint())
    vm = native.view(mp, GeoType.multipoint())
    assert np.array_equal(vm.offsets[0], [0, 1, 2])
    # native → WKT → back
    txt = kernels.cast(pts, GeoType.wkt())
    assert txt.to_pylist() == ["POINT (1 2)", "POINT (3 4)"]
    rt = kernels.cast(txt, GeoType.point(), GeoType.wkt())
    assert np.array_equal(native.view(rt, GeoType.point()).coords, [[1.0, 2.0], [3.0, 4.0]])


def test_format_geometry_reference_literals():
    # /root/reference/tests/testthat/test-vctr.R:12-30
    from georay.codecs import wkt as wkt_codec

    arr = pa.array(["POINT (0.222222 1.333333)", "POINT (1 2)"], pa.string())
    nat, t = wkt_codec.decode(arr, GeoType.point())
    out = ops.format_geometry(nat, t).to_pylist()
    assert out == ["<POINT (0.222222 1.333333)>", "<POINT (1 2)>"]
    out5 = ops.format_geometry(nat, t, width=30, digits=5).to_pylist()
    assert out5 == ["<POINT (0.22222 1.333>", "<POINT (1 2)>"]


def test_cast_geometry_propagates_crs(points_ds):
    out = ops.cast_geometry(points_ds, "geotag", GeoType.wkb())
    crs, crs_type, edges = ops.get_crs(out, "geotag")
    assert crs == "OGC:CRS84"  # src crs propagated into the WKB target
    t = GeoType.from_field(out.schema().base_schema.field("geotag"))
    assert t.serialized


def test_tile_assemble(points_ds, ray_session):
    ds = ops.add_tile_columns(points_ds, zoom=3)
    out = ops.tile_assemble(ds, max_ids_per_tile=4).take_all()
    total = sum(r["n_images"] for r in out)
    assert total == 500
    for r in out:
        assert len(r["sample_ids"]) <= 4
        assert r["n_images"] >= len(r["sample_ids"])


def test_apply_geo_kernel_extension(points_ds):
    def my_kernel(batch: pa.Table, geo: GeoType) -> pa.Table:
        assert geo.geometry_type == GeometryType.POINT
        lon, lat = ops.point_lonlat(batch, "geotag")
        return batch.append_column("east", pa.array(lon > 0))

    out = ops.apply_geo_kernel(points_ds, "geotag", my_kernel)
    rows = out.take_all()
    assert {"east"} <= set(rows[0].keys())


def test_infer_schema_dataset_level(ray_session):
    import ray.data as rd

    # serialized (WKT) column → inference runs, crs propagates
    tbl = pa.table(
        {"wkt": pa.array(["POINT (0 1)", "MULTIPOINT (2 3)"], pa.string())},
        schema=pa.schema([GeoType.wkt(crs="EPSG:4326").field("wkt")]),
    )
    ds = rd.from_arrow(tbl)
    t = ops.infer_geo_schema(ds, "wkt")
    assert t.geometry_type == GeometryType.MULTIPOINT  # promotion
    assert t.crs == "EPSG:4326"

    # native column short-circuits to its own schema (R/infer-default.R:88-91)
    pts = generate.make_images_table(50, seed=8)
    ds2 = rd.from_arrow(pts.select(["image_id", "geotag"]))
    t2 = ops.infer_geo_schema(ds2, "geotag")
    assert t2.geometry_type == GeometryType.POINT
    assert t2.crs == "OGC:CRS84"

    # bare utf8 storage infers as WKT by convention (R/type.R:272-281)
    ds3 = rd.from_arrow(pa.table({"wkt": pa.array(["POINT (5 6)"])}))
    t3 = ops.infer_geo_schema(ds3, "wkt")
    assert t3.geometry_type == GeometryType.POINT


def test_void_kernels():
    pts = native.build_points(np.array([[1.0, 2.0]]), GeoType.point())
    v = kernels.void(pts)
    assert len(v) == 1 and v.null_count == 1
    assert len(kernels.void_agg_finish([None])) == 1
