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


def read_geojsonl(
    paths,
    target: GeoType,
    out_col: str = "geometry",
    properties: dict | None = None,
    **read_text_kwargs,
) -> rd.Dataset:
    """Newline-delimited GeoJSON Feature source (GeoJSONSeq /
    ``.geojsonl`` — the SPLITTABLE framing; a single FeatureCollection
    document cannot be sharded, so at scale the corpus should be stored
    one feature per line): ``ray.data.read_text`` streams lines, each
    batch parses its features, projects the requested ``properties``
    (column name → pyarrow type) and decodes geometry into the typed
    native column (codecs/geojson.py). Null geometry stays null."""
    import json

    from georay.codecs import geojson as gj
    from georay.codecs.wkb import build_native

    props = dict(properties or {})

    def parse(batch: pa.Table) -> pa.Table:
        feats = [
            json.loads(line)
            for line in batch["text"].to_pylist()
            if line.strip()
        ]
        cols = {
            name: pa.array(
                [f.get("properties", {}).get(name) for f in feats], typ
            )
            for name, typ in props.items()
        }
        nodes = [
            gj._node_from_obj(f["geometry"])
            if f.get("geometry") is not None else None
            for f in feats
        ]
        geom = build_native(nodes, target)
        out = pa.table(cols) if cols else pa.table(
            {"_": pa.nulls(len(feats))}
        ).drop_columns(["_"])
        return out.append_column(target.field(out_col), geom)

    return rd.read_text(paths, **read_text_kwargs).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def write_geojsonl(
    ds: rd.Dataset,
    out_dir: str,
    geom_col: str,
    geo: GeoType,
    property_cols: tuple = (),
) -> rd.Dataset:
    """Sharded GeoJSONSeq sink: every block serializes its rows as
    ``{"type":"Feature","properties":{...},"geometry":{...}}`` lines and
    writes ONE ``part-<contenthash>.geojsonl`` file from inside its own
    task (no driver funnel; atomic tmp+rename, so reruns overwrite
    identical content idempotently). Returns the manifest Dataset
    ``(path, rows)`` — consume it to drive the write."""
    import hashlib
    import json
    import os

    from georay.codecs import geojson as gj

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        geom = batch[geom_col]
        if isinstance(geom, pa.ChunkedArray):
            geom = geom.combine_chunks()
        js = gj.encode(geom, geo)
        lines = []
        for i in range(len(batch)):
            props = {c: batch[c][i].as_py() for c in property_cols}
            g = js[i].as_py()
            lines.append(
                '{"type":"Feature","properties":'
                + json.dumps(props, sort_keys=True)
                + ',"geometry":' + (g if g is not None else "null") + "}"
            )
        blob = "\n".join(lines) + "\n"
        name = hashlib.sha1(blob.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.geojsonl")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "rows": pa.array([len(batch)], pa.int64())}
        )

    return ds.map_batches(
        dump, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
