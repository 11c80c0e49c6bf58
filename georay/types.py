"""GeoArrow type system for the georay engine.

Replicates the reference type model — the (geometry_type, dimensions,
coord_type) triple, the integer type-id algebra, the Arrow storage layouts,
and the extension metadata JSON — as plain Python over pyarrow.

Reference parity (behavior only, no code copied):
- enum values: /root/reference/src/geoarrow/geoarrow.h:324-470
- storage layouts + child field names: /root/reference/src/geoarrow.c:10-208
- extension names: /root/reference/R/pkg-nanoarrow.R:48-54
- metadata JSON serialization: /root/reference/R/type.R:310-362
  (tests /root/reference/tests/testthat/test-type.R:55-109)
- storage-type inference for bare arrays: /root/reference/R/type.R:272-281
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, replace
from enum import IntEnum

import pyarrow as pa

EXTENSION_NAME_KEY = b"ARROW:extension:name"
EXTENSION_METADATA_KEY = b"ARROW:extension:metadata"


class GeometryType(IntEnum):
    """geoarrow.h:401-410 — values match ISO WKB geometry-type codes."""

    GEOMETRY = 0
    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
    BOX = 990


class Dimensions(IntEnum):
    """geoarrow.h:415-420."""

    UNKNOWN = 0
    XY = 1
    XYZ = 2
    XYM = 3
    XYZM = 4

    @property
    def letters(self) -> str:
        return _DIM_LETTERS[self]

    @property
    def count(self) -> int:
        return len(_DIM_LETTERS[self])


_DIM_LETTERS = {
    Dimensions.XY: "xy",
    Dimensions.XYZ: "xyz",
    Dimensions.XYM: "xym",
    Dimensions.XYZM: "xyzm",
}


class CoordType(IntEnum):
    """geoarrow.h:425-428."""

    UNKNOWN = 0
    SEPARATE = 1
    INTERLEAVED = 2


class EdgeType(IntEnum):
    """geoarrow.h:433-439 (values implicit 0..5)."""

    PLANAR = 0
    SPHERICAL = 1
    VINCENTY = 2
    THOMAS = 3
    ANDOYER = 4
    KARNEY = 5


class CrsType(IntEnum):
    """geoarrow.h:444-450 (values implicit 0..5)."""

    NONE = 0
    UNKNOWN = 1
    PROJJSON = 2
    WKT2_2019 = 3
    AUTHORITY_CODE = 4
    SRID = 5


class TypeId(IntEnum):
    """Composed type ids, geoarrow.h:324-395.

    Native ids follow ``dimensions*1000 + geometry_type`` (SEPARATE) and
    ``+10000`` for INTERLEAVED; serialized (WKT/WKB) types use 1000xx codes.
    """

    UNINITIALIZED = 0
    WKB = 100001
    LARGE_WKB = 100002
    WKT = 100003
    LARGE_WKT = 100004
    WKB_VIEW = 100005
    WKT_VIEW = 100006


SERIALIZED_IDS = {
    TypeId.WKB,
    TypeId.LARGE_WKB,
    TypeId.WKT,
    TypeId.LARGE_WKT,
    TypeId.WKB_VIEW,
    TypeId.WKT_VIEW,
}

_SERIALIZED_EXT_NAME = {
    TypeId.WKB: "geoarrow.wkb",
    TypeId.LARGE_WKB: "geoarrow.wkb",
    TypeId.WKB_VIEW: "geoarrow.wkb",
    TypeId.WKT: "geoarrow.wkt",
    TypeId.LARGE_WKT: "geoarrow.wkt",
    TypeId.WKT_VIEW: "geoarrow.wkt",
}

_NATIVE_EXT_NAME = {
    GeometryType.POINT: "geoarrow.point",
    GeometryType.LINESTRING: "geoarrow.linestring",
    GeometryType.POLYGON: "geoarrow.polygon",
    GeometryType.MULTIPOINT: "geoarrow.multipoint",
    GeometryType.MULTILINESTRING: "geoarrow.multilinestring",
    GeometryType.MULTIPOLYGON: "geoarrow.multipolygon",
    GeometryType.BOX: "geoarrow.box",
}

# list-nesting child names per geometry type, src/geoarrow.c:102-111
_CHILD_NAMES = {
    GeometryType.LINESTRING: ["vertices"],
    GeometryType.POLYGON: ["rings", "vertices"],
    GeometryType.MULTIPOINT: ["points"],
    GeometryType.MULTILINESTRING: ["linestrings", "vertices"],
    GeometryType.MULTIPOLYGON: ["polygons", "rings", "vertices"],
}


@dataclass(frozen=True)
class GeoType:
    """A parsed GeoArrow type: what ``geoarrow_schema_parse`` returns.

    Mirrors /root/reference/R/type.R:267-285 + src/r-type.c:29-94.
    """

    geometry_type: GeometryType = GeometryType.GEOMETRY
    dimensions: Dimensions = Dimensions.XY
    coord_type: CoordType = CoordType.SEPARATE
    serialized: TypeId = TypeId.UNINITIALIZED  # WKT/WKB family, else UNINITIALIZED
    crs: str | None = None
    crs_type: CrsType = CrsType.NONE
    edge_type: EdgeType = EdgeType.PLANAR

    # ------------------------------------------------------------------ ids
    @property
    def id(self) -> int:
        """Integer type id per the reference algebra (geoarrow.h:324-395)."""
        if self.serialized != TypeId.UNINITIALIZED:
            return int(self.serialized)
        if self.geometry_type == GeometryType.BOX:
            return (int(self.dimensions) - 1) * 1000 + 990
        base = int(self.dimensions - 1) * 1000 + int(self.geometry_type)
        if self.coord_type == CoordType.INTERLEAVED:
            base += 10000
        return base

    @property
    def extension_name(self) -> str:
        if self.serialized != TypeId.UNINITIALIZED:
            return _SERIALIZED_EXT_NAME[self.serialized]
        return _NATIVE_EXT_NAME[self.geometry_type]

    # ------------------------------------------------------------ metadata
    def metadata_json(self) -> str:
        """Byte-exact replica of R/type.R:324-349 metadata serialization.

        PLANAR edges are omitted; NONE crs is omitted; UNKNOWN crs is a
        JSON string with only double-quotes escaped; PROJJSON crs is
        embedded verbatim.
        """
        parts = []
        if self.crs_type == CrsType.UNKNOWN:
            escaped = (self.crs or "").replace('"', '\\"')
            parts.append(f'"crs":"{escaped}"')
        elif self.crs_type == CrsType.PROJJSON:
            parts.append(f'"crs":{self.crs}')
        elif self.crs_type in (CrsType.WKT2_2019, CrsType.AUTHORITY_CODE, CrsType.SRID):
            escaped = (self.crs or "").replace('"', '\\"')
            parts.append(f'"crs":"{escaped}"')
        if self.edge_type != EdgeType.PLANAR:
            parts.append(f'"edges":"{self.edge_type.name.lower()}"')
        return "{" + ",".join(parts) + "}"

    # ------------------------------------------------------------- storage
    def coord_storage(self) -> pa.DataType:
        letters = self.dimensions.letters
        if self.coord_type == CoordType.INTERLEAVED:
            return pa.list_(
                pa.field(letters, pa.float64(), nullable=False), len(letters)
            )
        return pa.struct(
            [pa.field(c, pa.float64(), nullable=False) for c in letters]
        )

    def storage_type(self) -> pa.DataType:
        """The Arrow storage type, layouts per src/geoarrow.c:113-208."""
        s = self.serialized
        if s == TypeId.WKT:
            return pa.string()
        if s == TypeId.LARGE_WKT:
            return pa.large_string()
        if s == TypeId.WKT_VIEW:
            return pa.string_view()
        if s == TypeId.WKB:
            return pa.binary()
        if s == TypeId.LARGE_WKB:
            return pa.large_binary()
        if s == TypeId.WKB_VIEW:
            return pa.binary_view()

        gt = self.geometry_type
        if gt == GeometryType.BOX:
            letters = self.dimensions.letters
            names = [f"{c}min" for c in letters] + [f"{c}max" for c in letters]
            return pa.struct(
                [pa.field(n, pa.float64(), nullable=False) for n in names]
            )
        if gt == GeometryType.POINT:
            return self.coord_storage()
        inner = self.coord_storage()
        for child_name in reversed(_CHILD_NAMES[gt]):
            inner = pa.list_(pa.field(child_name, inner, nullable=False))
        return inner

    def field(self, name: str = "geometry", nullable: bool = True) -> pa.Field:
        """An Arrow field carrying the GeoArrow extension metadata."""
        return pa.field(
            name,
            self.storage_type(),
            nullable=nullable,
            metadata={
                EXTENSION_NAME_KEY: self.extension_name.encode(),
                EXTENSION_METADATA_KEY: self.metadata_json().encode(),
            },
        )

    def with_crs(self, crs: str | None, crs_type: CrsType | None = None) -> "GeoType":
        if crs is None:
            return replace(self, crs=None, crs_type=CrsType.NONE)
        if crs_type is None:
            crs_type = _infer_crs_type(crs)
        return replace(self, crs=crs, crs_type=crs_type)

    def with_edges(self, edges: EdgeType) -> "GeoType":
        return replace(self, edge_type=edges)

    def with_coord_type(self, coord_type: CoordType) -> "GeoType":
        return replace(self, coord_type=coord_type)

    def with_dimensions(self, dims: Dimensions) -> "GeoType":
        return replace(self, dimensions=dims)

    # -------------------------------------------------------- constructors
    @staticmethod
    def wkt(crs: str | None = None, edges: EdgeType = EdgeType.PLANAR) -> "GeoType":
        return GeoType(serialized=TypeId.WKT, edge_type=edges).with_crs(crs)

    @staticmethod
    def large_wkt(crs: str | None = None, edges: EdgeType = EdgeType.PLANAR) -> "GeoType":
        return GeoType(serialized=TypeId.LARGE_WKT, edge_type=edges).with_crs(crs)

    @staticmethod
    def wkb(crs: str | None = None, edges: EdgeType = EdgeType.PLANAR) -> "GeoType":
        return GeoType(serialized=TypeId.WKB, edge_type=edges).with_crs(crs)

    @staticmethod
    def large_wkb(crs: str | None = None, edges: EdgeType = EdgeType.PLANAR) -> "GeoType":
        return GeoType(serialized=TypeId.LARGE_WKB, edge_type=edges).with_crs(crs)

    @staticmethod
    def native(
        geometry_type: GeometryType,
        dimensions: Dimensions = Dimensions.XY,
        coord_type: CoordType = CoordType.SEPARATE,
        crs: str | None = None,
        edges: EdgeType = EdgeType.PLANAR,
    ) -> "GeoType":
        return GeoType(
            geometry_type=geometry_type,
            dimensions=dimensions,
            coord_type=coord_type,
            edge_type=edges,
        ).with_crs(crs)

    @staticmethod
    def point(**kw) -> "GeoType":
        return GeoType.native(GeometryType.POINT, **kw)

    @staticmethod
    def linestring(**kw) -> "GeoType":
        return GeoType.native(GeometryType.LINESTRING, **kw)

    @staticmethod
    def polygon(**kw) -> "GeoType":
        return GeoType.native(GeometryType.POLYGON, **kw)

    @staticmethod
    def multipoint(**kw) -> "GeoType":
        return GeoType.native(GeometryType.MULTIPOINT, **kw)

    @staticmethod
    def multilinestring(**kw) -> "GeoType":
        return GeoType.native(GeometryType.MULTILINESTRING, **kw)

    @staticmethod
    def multipolygon(**kw) -> "GeoType":
        return GeoType.native(GeometryType.MULTIPOLYGON, **kw)

    @staticmethod
    def box(
        dimensions: Dimensions = Dimensions.XY,
        crs: str | None = None,
        edges: EdgeType = EdgeType.PLANAR,
    ) -> "GeoType":
        return GeoType(
            geometry_type=GeometryType.BOX,
            dimensions=dimensions,
        ).with_crs(crs).with_edges(edges)

    @staticmethod
    def from_id(type_id: int) -> "GeoType":
        """Invert the id algebra."""
        if type_id in set(int(t) for t in SERIALIZED_IDS):
            return GeoType(serialized=TypeId(type_id))
        coord_type = CoordType.SEPARATE
        if type_id >= 10000:
            coord_type = CoordType.INTERLEAVED
            type_id -= 10000
        dims = Dimensions(type_id // 1000 + 1)
        geom = GeometryType(type_id % 1000)
        return GeoType(geometry_type=geom, dimensions=dims, coord_type=coord_type)

    # --------------------------------------------------------------- parse
    @staticmethod
    def from_field(f: pa.Field, infer_from_storage: bool = True) -> "GeoType":
        """Parse an Arrow field (extension metadata + storage) into a GeoType.

        With ``infer_from_storage`` and no extension metadata, uses the
        reference's convention (R/type.R:272-281): utf8→wkt, binary→wkb,
        struct→point.
        """
        # a registered GeometryExtensionType (georay.extension) carries
        # the parsed GeoType itself
        if isinstance(f.type, pa.ExtensionType):
            t = f.type
            geo = getattr(t, "geo", None)
            if geo is not None:
                return geo
            gt = _parse_storage(t.extension_name, t.storage_type)
            meta_bytes = t.__arrow_ext_serialize__()
            if meta_bytes:
                gt = _apply_metadata_json(gt, meta_bytes.decode())
            return gt
        meta = f.metadata or {}
        ext_name = meta.get(EXTENSION_NAME_KEY, b"").decode() or None
        ext_meta = meta.get(EXTENSION_METADATA_KEY, b"").decode() or None
        if ext_name is None:
            if not infer_from_storage:
                raise ValueError(f"field {f.name!r} has no GeoArrow extension metadata")
            ext_name = _ext_name_from_storage(f.type)
        gt = _parse_storage(ext_name, f.type)
        if ext_meta:
            gt = _apply_metadata_json(gt, ext_meta)
        return gt


def _infer_crs_type(crs: str) -> CrsType:
    """sanitize_crs (R/type.R:352-362): JSON object → PROJJSON, else UNKNOWN."""
    s = crs.strip()
    if s.startswith("{") and s.endswith("}"):
        try:
            json.loads(s)
            return CrsType.PROJJSON
        except (json.JSONDecodeError, ValueError):
            return CrsType.UNKNOWN
    return CrsType.UNKNOWN


def _ext_name_from_storage(t: pa.DataType) -> str:
    if pa.types.is_string(t) or pa.types.is_large_string(t) or (
        hasattr(pa.types, "is_string_view") and pa.types.is_string_view(t)
    ):
        return "geoarrow.wkt"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or (
        hasattr(pa.types, "is_binary_view") and pa.types.is_binary_view(t)
    ):
        return "geoarrow.wkb"
    if pa.types.is_struct(t):
        names = [t.field(i).name for i in range(t.num_fields)]
        if names and names[0].endswith("min"):
            return "geoarrow.box"
        return "geoarrow.point"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        # count nesting levels down to the coord type
        depth = 0
        cur = t
        while pa.types.is_list(cur) or pa.types.is_large_list(cur):
            cur = cur.value_type
            depth += 1
        if pa.types.is_fixed_size_list(cur):
            # interleaved point nested by depth
            return {
                0: "geoarrow.point",
                1: "geoarrow.linestring",  # ambiguous with multipoint; child name decides later
                2: "geoarrow.polygon",
                3: "geoarrow.multipolygon",
            }[depth]
        if pa.types.is_struct(cur):
            child = t.value_field.name if depth >= 1 else ""
            if depth == 1:
                return "geoarrow.multipoint" if child == "points" else "geoarrow.linestring"
            if depth == 2:
                return (
                    "geoarrow.multilinestring"
                    if child == "linestrings"
                    else "geoarrow.polygon"
                )
            if depth == 3:
                return "geoarrow.multipolygon"
    raise ValueError(f"cannot infer GeoArrow extension name from storage type {t}")


def _dims_from_letters(letters: str) -> Dimensions:
    try:
        return {v: k for k, v in _DIM_LETTERS.items()}[letters]
    except KeyError:
        raise ValueError(f"unknown dimension letters {letters!r}") from None


def _parse_storage(ext_name: str, t: pa.DataType) -> GeoType:
    if ext_name == "geoarrow.wkt":
        if pa.types.is_large_string(t):
            return GeoType(serialized=TypeId.LARGE_WKT)
        if hasattr(pa.types, "is_string_view") and pa.types.is_string_view(t):
            return GeoType(serialized=TypeId.WKT_VIEW)
        return GeoType(serialized=TypeId.WKT)
    if ext_name == "geoarrow.wkb":
        if pa.types.is_large_binary(t):
            return GeoType(serialized=TypeId.LARGE_WKB)
        if hasattr(pa.types, "is_binary_view") and pa.types.is_binary_view(t):
            return GeoType(serialized=TypeId.WKB_VIEW)
        return GeoType(serialized=TypeId.WKB)

    geom = {v: k for k, v in _NATIVE_EXT_NAME.items()}[ext_name]
    if geom == GeometryType.BOX:
        n = t.num_fields // 2
        letters = "".join(t.field(i).name[0] for i in range(n))
        return GeoType(
            geometry_type=GeometryType.BOX, dimensions=_dims_from_letters(letters)
        )
    # unwrap list nesting down to the coord storage
    cur = t
    while pa.types.is_list(cur) or pa.types.is_large_list(cur):
        cur = cur.value_type
    if pa.types.is_fixed_size_list(cur):
        letters = cur.value_field.name
        return GeoType(
            geometry_type=geom,
            dimensions=_dims_from_letters(letters),
            coord_type=CoordType.INTERLEAVED,
        )
    if pa.types.is_struct(cur):
        letters = "".join(cur.field(i).name for i in range(cur.num_fields))
        return GeoType(
            geometry_type=geom,
            dimensions=_dims_from_letters(letters),
            coord_type=CoordType.SEPARATE,
        )
    raise ValueError(f"unsupported storage type {t} for {ext_name}")


_EDGES_RE = re.compile(r'"edges"\s*:\s*"([a-z]+)"')


def _apply_metadata_json(gt: GeoType, meta: str) -> GeoType:
    """Parse the extension metadata JSON {"crs": ..., "edges": ...}.

    Tolerant parse mirroring src/geoarrow.c:970-1265: crs may be a JSON
    object (PROJJSON, kept verbatim) or a string (UNKNOWN).
    """
    edges = EdgeType.PLANAR
    m = _EDGES_RE.search(meta)
    if m:
        edges = EdgeType[m.group(1).upper()]
    crs = None
    crs_type = CrsType.NONE
    try:
        obj = json.loads(meta)
    except (json.JSONDecodeError, ValueError):
        obj = {}
    if "crs" in obj:
        v = obj["crs"]
        if isinstance(v, (dict, list)):
            # re-serialize compactly; PROJJSON is embedded verbatim on write
            crs = json.dumps(v, separators=(",", ":"))
            crs_type = CrsType.PROJJSON
        elif v is None:
            crs, crs_type = None, CrsType.NONE
        else:
            crs = str(v)
            crs_type = CrsType.UNKNOWN
    return replace(gt, crs=crs, crs_type=crs_type, edge_type=edges)


def geo_fields(schema: pa.Schema) -> dict[str, GeoType]:
    """All columns in ``schema`` carrying GeoArrow extension metadata."""
    out: dict[str, GeoType] = {}
    for f in schema:
        meta = f.metadata or {}
        if EXTENSION_NAME_KEY in meta and meta[EXTENSION_NAME_KEY].startswith(b"geoarrow."):
            out[f.name] = GeoType.from_field(f)
    return out
