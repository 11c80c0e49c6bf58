"""georay — a Ray-Data-native spatial-join + tiling engine.

Data model and geometry-kernel semantics follow geoarrow/geoarrow-r
(reference at /root/reference, studied for behavior only); execution is
idiomatic Ray Data: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
partitioning / shuffle / skew handling.
"""

from georay.types import (
    CoordType,
    CrsType,
    Dimensions,
    EdgeType,
    GeometryType,
    GeoType,
    TypeId,
    geo_fields,
)

__all__ = [
    "CoordType",
    "CrsType",
    "Dimensions",
    "EdgeType",
    "GeometryType",
    "GeoType",
    "TypeId",
    "geo_fields",
]

__version__ = "0.3.0"
