"""Arrow extension-type registration (SURVEY §2.A rows 36–37).

Mirrors the reference's ``GeometryExtensionType`` surface
(/root/reference/R/pkg-arrow.R:65-183): one registered extension type per
geoarrow extension name, so any Arrow consumer (IPC, parquet reads,
``pa.Table`` round-trips) surfaces geometry columns as typed extension
arrays instead of bare storage + field metadata. The parsed-type
accessors (``geoarrow_id``/``geometry_type``/``crs``/``dimensions``/
``coord_type``/``edge_type``) and the ``ToString`` format — including the
"spherical geoarrow.point <CRS: …>" label and the 27-char CRS
truncation — replicate the reference
(tests pinned against /root/reference/tests/testthat/test-pkg-arrow.R:2-42).

Registration is explicit (``register_geoarrow_extension_types()``), the
same opt-in shape as the reference's arrow-onLoad hook: once registered,
parquet/IPC reads reconstruct the typed columns automatically; the engine
kernels accept both representations (``GeoType.from_field`` and
``native.view`` unwrap extension types/arrays).
"""

from __future__ import annotations

import pyarrow as pa

from georay.types import (
    CoordType,
    Dimensions,
    EdgeType,
    GeometryType,
    GeoType,
    _apply_metadata_json,
    _parse_storage,
)

_EXT_NAMES = (
    "geoarrow.wkt",
    "geoarrow.wkb",
    "geoarrow.point",
    "geoarrow.linestring",
    "geoarrow.polygon",
    "geoarrow.multipoint",
    "geoarrow.multilinestring",
    "geoarrow.multipolygon",
    "geoarrow.box",
)


class GeometryExtensionType(pa.ExtensionType):
    """Base class; one concrete subclass per geoarrow extension name."""

    _EXT_NAME: str = ""

    def __init__(self, geo: GeoType):
        self._geo = geo
        super().__init__(geo.storage_type(), geo.extension_name)

    # ---- parsed-type accessors (R/pkg-arrow.R active bindings) ----
    @property
    def geo(self) -> GeoType:
        return self._geo

    @property
    def geoarrow_id(self) -> int:
        return int(self._geo.id)

    @property
    def geometry_type(self) -> int:
        return int(self._geo.geometry_type)

    @property
    def dimensions(self) -> str:
        return Dimensions(self._geo.dimensions).name

    @property
    def coord_type(self) -> str:
        return CoordType(self._geo.coord_type).name

    @property
    def crs(self):
        return self._geo.crs

    @property
    def edge_type(self) -> str:
        return EdgeType(self._geo.edge_type).name

    def __arrow_ext_serialize__(self) -> bytes:
        return self._geo.metadata_json().encode("utf-8")

    def __hash__(self) -> int:
        # pa.ExtensionType defines __eq__ (C level) without __hash__, so
        # subclasses are unhashable by Python rules — which breaks
        # pa.Schema.__hash__ and with it Ray Data's schema dedup
        # (unify_schemas' set(schemas) early-exit). Hash the identity
        # triple the C-level __eq__ compares.
        return hash(
            (self._EXT_NAME, str(self.storage_type), self.__arrow_ext_serialize__())
        )

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        geo = _parse_storage(cls._EXT_NAME, storage_type)
        meta = serialized.decode("utf-8") if serialized else ""
        if meta:
            geo = _apply_metadata_json(geo, meta)
        return cls(geo)

    def __str__(self) -> str:
        # reference ToString (R/pkg-arrow.R:100-117): edge prefix when not
        # planar; crs label truncated at 30 chars
        label = self._geo.extension_name
        crs = self._geo.crs
        if not crs:
            crs_label = "<crs: unspecified>"
        elif len(crs) > 30:
            crs_label = f"<CRS: {crs[:27]}..."
        else:
            crs_label = f"<CRS: {crs}>"
        if self._geo.edge_type != EdgeType.PLANAR:
            label = f"{EdgeType(self._geo.edge_type).name.lower()} {label}"
        return f"{label} {crs_label}"


def _default_geo(ext_name: str) -> GeoType:
    if ext_name == "geoarrow.wkt":
        return GeoType.wkt()
    if ext_name == "geoarrow.wkb":
        return GeoType.wkb()
    if ext_name == "geoarrow.box":
        return GeoType.box()
    geom = GeometryType[ext_name.split(".", 1)[1].upper()]
    return GeoType.native(geom)


_CLASSES: dict[str, type] = {}
for _name in _EXT_NAMES:
    _CLASSES[_name] = type(
        f"GeometryExtensionType_{_name.split('.', 1)[1]}",
        (GeometryExtensionType,),
        {"_EXT_NAME": _name},
    )


def extension_type(geo: GeoType) -> GeometryExtensionType:
    """The typed wrapper for one GeoType."""
    return _CLASSES[geo.extension_name](geo)


_registered = False


def register_geoarrow_extension_types() -> None:
    """Register all 9 extension names with pyarrow (idempotent) —
    R/pkg-arrow.R register_arrow_extension_type equivalent."""
    global _registered
    if _registered:
        return
    for name in _EXT_NAMES:
        try:
            pa.register_extension_type(_CLASSES[name](_default_geo(name)))
        except pa.ArrowKeyError:
            pass  # already registered in this process
    _registered = True


def unregister_geoarrow_extension_types() -> None:
    global _registered
    for name in _EXT_NAMES:
        try:
            pa.unregister_extension_type(name)
        except pa.ArrowKeyError:
            pass
    _registered = False


def as_extension_array(arr: pa.Array | pa.ChunkedArray, geo: GeoType | None = None):
    """Wrap a storage array (or pass through an extension array) as the
    typed GeometryExtensionType array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr.type, pa.ExtensionType):
        return arr
    if geo is None:
        geo = GeoType.from_field(pa.field("g", arr.type))
    return pa.ExtensionArray.from_storage(extension_type(geo), arr)


def storage_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Unwrap an extension array to its storage (no-op otherwise)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ExtensionArray):
        return arr.storage
    return arr
