"""Arrow extension-type registration tests, mirroring
/root/reference/tests/testthat/test-pkg-arrow.R:2-42 (accessor values and
the exact ToString format) plus Table/IPC/parquet round-trips."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from georay import extension as ext
from georay.codecs import native, wkt
from georay.types import EdgeType, GeoType


@pytest.fixture(scope="module", autouse=True)
def registered():
    ext.register_geoarrow_extension_types()
    yield
    ext.unregister_geoarrow_extension_types()


def test_extension_type_accessors_match_reference():
    # test-pkg-arrow.R:2-15
    t = ext.extension_type(
        GeoType.point(crs="EPSG:1234").with_edges(EdgeType.SPHERICAL)
    )
    assert t.geoarrow_id == 1
    assert t.geometry_type == 1
    assert t.extension_name == "geoarrow.point"
    assert t.crs == "EPSG:1234"
    assert t.dimensions == "XY"
    assert t.coord_type == "SEPARATE"
    assert t.edge_type == "SPHERICAL"


def test_extension_type_tostring_matches_reference():
    # test-pkg-arrow.R:17-41 — exact strings
    t = ext.extension_type(
        GeoType.point(crs="EPSG:1234").with_edges(EdgeType.SPHERICAL)
    )
    assert str(t) == "spherical geoarrow.point <CRS: EPSG:1234>"
    t2 = ext.extension_type(
        GeoType.point(crs="a" * 100).with_edges(EdgeType.SPHERICAL)
    )
    assert str(t2) == "spherical geoarrow.point <CRS: " + "a" * 27 + "..."
    t3 = ext.extension_type(GeoType.point())
    assert str(t3) == "geoarrow.point <crs: unspecified>"


def test_extension_array_roundtrip_through_ipc():
    geo = GeoType.point(crs="OGC:CRS84")
    pts = native.build_points(np.array([[1.0, 2.0], [3.0, 4.0]]), geo)
    arr = ext.as_extension_array(pts, geo)
    tbl = pa.table({"g": arr})
    # IPC round-trip reconstructs the REGISTERED type, not bare storage
    import io

    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, tbl.schema) as w:
        w.write_table(tbl)
    buf.seek(0)
    back = pa.ipc.open_stream(buf).read_all()
    t = back.schema.field("g").type
    assert isinstance(t, ext.GeometryExtensionType)
    assert t.extension_name == "geoarrow.point"
    assert t.crs == "OGC:CRS84"
    # kernels accept the extension array directly
    v = native.view(back["g"].combine_chunks())
    assert v.coords.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_parquet_read_surfaces_extension_type(tmp_path):
    # a field-metadata parquet file (the engine's normal output) reads
    # back as the registered extension type once registration is on
    geo = GeoType.wkt(crs="EPSG:32633")
    tbl = pa.table(
        {"g": pa.array(["POINT (0 1)", None], pa.string())},
        schema=pa.schema([geo.field("g")]),
    )
    p = str(tmp_path / "g.parquet")
    pq.write_table(tbl, p)
    back = pq.read_table(p)
    t = back.schema.field("g").type
    assert isinstance(t, ext.GeometryExtensionType)
    assert t.extension_name == "geoarrow.wkt"
    assert t.crs == "EPSG:32633"
    # from_field resolves the parsed GeoType straight off the type
    gt = GeoType.from_field(back.schema.field("g"))
    assert gt.extension_name == "geoarrow.wkt" and gt.crs == "EPSG:32633"
    # and the WKT codec path still decodes through the storage
    nat, t2 = wkt.decode(ext.storage_array(back["g"]), GeoType.point())
    assert native.view(nat, GeoType.point()).coords[0].tolist() == [0.0, 1.0]


def test_all_nine_names_register_and_deserialize():
    for name in ext._EXT_NAMES:
        geo = ext._default_geo(name)
        t = ext.extension_type(geo)
        ser = t.__arrow_ext_serialize__()
        back = type(t).__arrow_ext_deserialize__(t.storage_type, ser)
        assert back.extension_name == name
        assert back.geo.id == geo.id
