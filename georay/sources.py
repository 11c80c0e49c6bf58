"""Sources: ingest external geometry formats into typed Dataset columns.

The reference ingests WKT character vectors / WKB blobs / data frames
(`as_geoarrow_vctr`, R/type-vctr.R); the Ray-native equivalents here are
Dataset sources: CSV of WKT, parquet with geoarrow field metadata (works
out of the box via ``ray.data.read_parquet`` — metadata round-trips),
and an ``attach_geometry`` stage that decodes any WKT string / WKB
binary column into a typed geoarrow column inside ``map_batches``.

Decode is per-feature by design (text/binary parsing); the stage shape
is streaming (one pass, no driver materialization) and the parsed
output is the zero-copy native layout every downstream kernel consumes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from georay.types import GeoType


def attach_geometry(
    ds: rd.Dataset,
    col: str,
    target: GeoType | None = None,
    out_col: str | None = None,
    drop_source: bool = False,
) -> rd.Dataset:
    """Decode a WKT string column or WKB binary column into a typed
    geoarrow column (inferred narrowest type unless ``target`` given —
    pass an explicit ``target`` at scale so every batch agrees on the
    schema; inference is per-batch)."""
    out = out_col or f"{col}_geom"

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
            from georay.codecs import wkb as codec
        else:
            from georay.codecs import wkt as codec
        geom, geo = codec.decode(arr, target)
        batch = batch.append_column(geo.field(out), geom)
        if drop_source:
            batch = batch.drop_columns([col])
        return batch

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def read_wkt_csv(
    paths,
    wkt_col: str = "wkt",
    target: GeoType | None = None,
    out_col: str | None = None,
    **read_csv_kwargs,
) -> rd.Dataset:
    """CSV source with a WKT column → Dataset with a typed geometry
    column (the reference's character-vector ingest, as a streaming
    source): ``ray.data.read_csv`` + per-batch WKT decode."""
    ds = rd.read_csv(paths, **read_csv_kwargs)
    return attach_geometry(
        ds, wkt_col, target=target, out_col=out_col, drop_source=True
    )


def read_image_table(
    path: str,
    columns: list[str] | None = None,
    fmt: str = "auto",
    **read_kwargs,
) -> rd.Dataset:
    """Source for the engine's canonical image+caption table
    (image_id, bytes, w, h, fmt, caption, phash [, geotag]) from either
    a Lance dataset or parquet, with column pruning pushed to the read.

    The production target is a Lance table (columnar + random-access,
    the layout the north rule names); the sandbox has no ``lance``
    wheel, so the Lance branch is gated behind an import-try and
    parquet is the tested path — both return the identical Ray Dataset
    shape, and everything downstream (decode stages, PIP joins, tiling)
    is source-agnostic.

    ``fmt``: ``"lance"``, ``"parquet"``, or ``"auto"`` (``.lance``
    suffix or a ``_versions``/``data`` Lance layout under ``path``
    selects lance, else parquet).
    """
    import os

    if fmt == "auto":
        is_lance = str(path).rstrip("/").endswith(".lance") or (
            os.path.isdir(path)
            and os.path.isdir(os.path.join(path, "_versions"))
        )
        fmt = "lance" if is_lance else "parquet"
    if fmt == "lance":
        try:
            import lance  # noqa: F401  (ray.data.read_lance needs it)
        except ImportError as exc:
            raise ImportError(
                "read_image_table(fmt='lance') needs the 'lance' package; "
                "this environment does not ship it — materialize the table "
                "as parquet and use fmt='parquet' (same schema, same "
                "downstream pipeline)."
            ) from exc
        return rd.read_lance(path, columns=columns, **read_kwargs)
    if fmt != "parquet":
        raise ValueError(f"unknown image-table format: {fmt!r}")
    return rd.read_parquet(path, columns=columns, **read_kwargs)


def read_jsonl(
    paths,
    columns: list[str] | None = None,
    **read_json_kwargs,
) -> rd.Dataset:
    """Line-delimited JSON (JSONL/NDJSON) source — the de-facto
    interchange format for LLM document corpora. Wraps
    ``ray.data.read_json`` (Arrow's streaming NDJSON reader — blocks
    arrive as Arrow, zero-copy downstream) and applies column pruning
    as a projection immediately behind the read (Arrow's JSON reader
    has no column pushdown; the projection at least keeps pruned
    columns out of the object store)."""
    ds = rd.read_json(paths, **read_json_kwargs)
    if columns is not None:
        ds = ds.map_batches(
            lambda b, _c=list(columns): b.select(_c),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
    return ds


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """JSONL sink: one shard file per block via ``Dataset.write_json``
    (pandas-free, newline-delimited)."""
    ds.write_json(out_dir)
