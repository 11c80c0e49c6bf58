"""Type-system tests mirroring /root/reference/tests/testthat/test-type.R."""

import pyarrow as pa
import pytest

from georay.types import (
    CoordType,
    CrsType,
    Dimensions,
    EdgeType,
    GeometryType,
    GeoType,
    TypeId,
)


def test_serialized_storage_formats():
    # test-type.R:3-31
    assert GeoType.wkb().storage_type() == pa.binary()
    assert GeoType.large_wkb().storage_type() == pa.large_binary()
    assert GeoType.wkt().storage_type() == pa.string()
    assert GeoType.large_wkt().storage_type() == pa.large_string()


def test_point_storage_separate():
    t = GeoType.point().storage_type()
    assert t == pa.struct(
        [
            pa.field("x", pa.float64(), nullable=False),
            pa.field("y", pa.float64(), nullable=False),
        ]
    )


def test_point_storage_interleaved():
    t = GeoType.point(coord_type=CoordType.INTERLEAVED).storage_type()
    assert pa.types.is_fixed_size_list(t)
    assert t.list_size == 2
    assert t.value_field.name == "xy"
    t3 = GeoType.point(
        coord_type=CoordType.INTERLEAVED, dimensions=Dimensions.XYZ
    ).storage_type()
    assert t3.list_size == 3
    assert t3.value_field.name == "xyz"


def test_nested_child_names():
    # src/geoarrow.c:102-111
    ls = GeoType.linestring().storage_type()
    assert ls.value_field.name == "vertices"
    pol = GeoType.polygon().storage_type()
    assert pol.value_field.name == "rings"
    assert pol.value_type.value_field.name == "vertices"
    mp = GeoType.multipoint().storage_type()
    assert mp.value_field.name == "points"
    mls = GeoType.multilinestring().storage_type()
    assert mls.value_field.name == "linestrings"
    mpol = GeoType.multipolygon().storage_type()
    assert mpol.value_field.name == "polygons"
    assert mpol.value_type.value_field.name == "rings"
    assert mpol.value_type.value_type.value_field.name == "vertices"
    # all list children non-nullable
    assert not mpol.value_field.nullable


def test_box_storage():
    # mins first then maxes, src/geoarrow.c:45-72
    t = GeoType.box().storage_type()
    assert [t.field(i).name for i in range(4)] == ["xmin", "ymin", "xmax", "ymax"]
    tz = GeoType.box(dimensions=Dimensions.XYZ).storage_type()
    assert [tz.field(i).name for i in range(6)] == [
        "xmin",
        "ymin",
        "zmin",
        "xmax",
        "ymax",
        "zmax",
    ]


def test_type_id_algebra():
    # geoarrow.h:324-395
    assert GeoType.point().id == 1
    assert GeoType.linestring().id == 2
    assert GeoType.multipolygon().id == 6
    assert GeoType.point(dimensions=Dimensions.XYZ).id == 1001
    assert GeoType.point(dimensions=Dimensions.XYM).id == 2001
    assert GeoType.multipolygon(dimensions=Dimensions.XYZM).id == 3006
    assert GeoType.point(coord_type=CoordType.INTERLEAVED).id == 10001
    assert (
        GeoType.multipolygon(
            dimensions=Dimensions.XYZM, coord_type=CoordType.INTERLEAVED
        ).id
        == 13006
    )
    assert GeoType.box().id == 990
    assert GeoType.box(dimensions=Dimensions.XYZM).id == 3990
    assert GeoType.wkb().id == 100001
    assert GeoType.wkt().id == 100003


def test_from_id_roundtrip():
    for t in [
        GeoType.point(),
        GeoType.polygon(dimensions=Dimensions.XYZ),
        GeoType.multipoint(coord_type=CoordType.INTERLEAVED),
        GeoType.box(dimensions=Dimensions.XYM),
        GeoType.wkb(),
        GeoType.large_wkt(),
    ]:
        rt = GeoType.from_id(t.id)
        assert rt.id == t.id


def test_metadata_json_exact():
    # test-type.R:55-109 literal expectations
    assert GeoType.wkb(crs="{}", edges=EdgeType.SPHERICAL).metadata_json() == (
        '{"crs":{},"edges":"spherical"}'
    )
    assert GeoType.wkb(crs="{}", edges=EdgeType.VINCENTY).metadata_json() == (
        '{"crs":{},"edges":"vincenty"}'
    )
    assert GeoType.wkb(crs="{}", edges=EdgeType.THOMAS).metadata_json() == (
        '{"crs":{},"edges":"thomas"}'
    )
    assert GeoType.wkb(crs="{}", edges=EdgeType.ANDOYER).metadata_json() == (
        '{"crs":{},"edges":"andoyer"}'
    )
    assert GeoType.wkb(crs="{}", edges=EdgeType.KARNEY).metadata_json() == (
        '{"crs":{},"edges":"karney"}'
    )
    assert GeoType.wkb(crs="{}", edges=EdgeType.PLANAR).metadata_json() == '{"crs":{}}'
    assert GeoType.wkb(crs=None).metadata_json() == "{}"
    assert (
        GeoType.wkb(crs="some unknown crs").metadata_json()
        == '{"crs":"some unknown crs"}'
    )
    assert (
        GeoType.wkb(crs='unknown with quote"ing').metadata_json()
        == '{"crs":"unknown with quote\\"ing"}'
    )


def test_field_and_parse_roundtrip():
    for t in [
        GeoType.point(crs="OGC:CRS84"),
        GeoType.polygon(dimensions=Dimensions.XYZ),
        GeoType.multilinestring(coord_type=CoordType.INTERLEAVED),
        GeoType.wkt(edges=EdgeType.SPHERICAL),
        GeoType.wkb(crs="{}"),
        GeoType.box(),
    ]:
        f = t.field("g")
        parsed = GeoType.from_field(f)
        assert parsed.id == t.id
        assert parsed.edge_type == t.edge_type
        assert parsed.crs_type == t.crs_type


def test_parse_bare_storage():
    # R/type.R:272-281: storage conventions without extension metadata
    assert GeoType.from_field(pa.field("g", pa.string())).serialized == TypeId.WKT
    assert GeoType.from_field(pa.field("g", pa.binary())).serialized == TypeId.WKB
    pt = GeoType.from_field(
        pa.field("g", pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    )
    assert pt.geometry_type == GeometryType.POINT


def test_crs_type_inference():
    assert GeoType.wkb(crs="{}").crs_type == CrsType.PROJJSON
    assert GeoType.wkb(crs='{"id":1}').crs_type == CrsType.PROJJSON
    assert GeoType.wkb(crs="EPSG:4326").crs_type == CrsType.UNKNOWN
    assert GeoType.wkb().crs_type == CrsType.NONE


def test_enum_values_match_reference():
    # geoarrow.h:401-450
    assert GeometryType.GEOMETRYCOLLECTION == 7
    assert GeometryType.BOX == 990
    assert Dimensions.XYZM == 4
    assert CoordType.INTERLEAVED == 2
    assert EdgeType.KARNEY == 5
    assert CrsType.SRID == 5
