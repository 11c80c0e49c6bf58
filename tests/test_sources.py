"""Source-layer tests: CSV-of-WKT ingest and typed geometry attach."""

import numpy as np
import pyarrow as pa
import pytest

from georay import ops, sources
from georay.codecs import native, wkt as wkt_codec
from georay.types import GeoType


def test_attach_geometry_wkt_and_wkb(ray_session):
    import ray.data as rd

    wkts = ["POINT (1 2)", "POINT (-3.5 4.25)", None, "POINT EMPTY"]
    t = pa.table({"rid": pa.array(range(4), pa.int64()), "wkt": pa.array(wkts)})
    ds = sources.attach_geometry(
        rd.from_arrow(t), "wkt", target=GeoType.point(), out_col="g"
    )
    out = ds.take_all()
    assert len(out) == 4
    got = out[0]
    # decode back: first point round-trips
    tbl = pa.Table.from_pylist(out)
    lon, lat = None, None
    back = ds.to_pandas()
    assert "g" in back.columns

    # WKB path
    pts = native.build_points(np.array([[1.0, 2.0], [5.0, -6.0]]), GeoType.point())
    from georay.codecs import wkb as wkb_codec

    blobs = wkb_codec.encode(pts, GeoType.point())
    t2 = pa.table({"rid": pa.array(range(2), pa.int64()), "wkb": blobs})
    ds2 = sources.attach_geometry(
        rd.from_arrow(t2), "wkb", target=GeoType.point(), out_col="g", drop_source=True
    )
    b = pa.concat_tables(ds2.iter_batches(batch_format="pyarrow", batch_size=None))
    v = native.view(b["g"].combine_chunks())
    assert np.allclose(v.coords, [[1.0, 2.0], [5.0, -6.0]])


def test_read_wkt_csv_roundtrip(ray_session, tmp_path):
    import csv

    import ray.data as rd

    rng = np.random.default_rng(12)
    xy = np.column_stack([
        np.round(rng.uniform(-180, 180, 50), 6),
        np.round(rng.uniform(-85, 85, 50), 6),
    ])
    geo = GeoType.point()
    wkts = wkt_codec.encode(native.build_points(xy, geo), geo).to_pylist()
    path = tmp_path / "pts.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["rid", "wkt"])
        for i, s in enumerate(wkts):
            w.writerow([i, s])

    ds = sources.read_wkt_csv(str(path), target=GeoType.point(), out_col="geotag")
    b = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    order = np.argsort(b["rid"].to_numpy())
    v = native.view(b["geotag"].combine_chunks())
    assert np.array_equal(v.coords[order], xy)


@pytest.fixture(scope="module")
def images_dir(tmp_path_factory, ray_session):
    from georay import generate

    d = tmp_path_factory.mktemp("images_src")
    generate.write_images_dataset(str(d), 500, seed=42, rows_per_file=250)
    return str(d)

def test_read_image_table_parquet_pruned(images_dir, ray_session):
    from georay.sources import read_image_table

    ds = read_image_table(images_dir, columns=["image_id", "phash"])
    assert set(ds.schema().names) == {"image_id", "phash"}
    assert ds.count() > 0


def test_read_image_table_lance_gated(images_dir, ray_session):
    import pytest

    from georay.sources import read_image_table

    try:
        import lance  # noqa: F401

        have_lance = True
    except ImportError:
        have_lance = False
    if have_lance:
        pytest.skip("lance available; gate path not reachable")
    with pytest.raises(ImportError, match="parquet"):
        read_image_table("/tmp/whatever.lance", fmt="lance")


def test_read_image_table_auto_dispatch(images_dir, ray_session):
    from georay.sources import read_image_table

    # a plain parquet dir auto-dispatches to parquet
    ds = read_image_table(images_dir)
    assert "bytes" in ds.schema().names


def test_jsonl_roundtrip(tmp_path, ray_session):
    import json

    import pyarrow as pa
    import ray.data as rd

    from georay import sources

    rows = [{"doc_id": i, "lang": "en" if i % 2 else "fr", "text": f"t{i}\nx"}
            for i in range(20)]
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = sources.read_jsonl(str(p), columns=["doc_id", "lang"])
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "lang"]
    assert len(df) == 20 and df["lang"][1] == "en"
    # sink round trip (embedded newlines survive JSON escaping)
    out = tmp_path / "out"
    sources.write_jsonl(rd.from_arrow(pa.table({"a": pa.array([1, 2])})), str(out))
    back = sources.read_jsonl(str(out)).to_pandas()
    assert sorted(back["a"].tolist()) == [1, 2]


def test_geojsonl_sink_source_roundtrip(ray_session, tmp_path):
    """write_geojsonl -> read_geojsonl reproduces the original rows
    (geometry bit-exact via shortest-round-trip JSON numbers; nulls and
    properties survive)."""
    import numpy as np
    import ray.data as rd

    from georay import sources
    from georay.codecs import native, wkt
    from georay.types import GeoType

    geo = GeoType.point(crs="OGC:CRS84")
    coords = np.array([[0.15000000000000413, -7.25], [30.0, 10.0], [1e-06, 2.0]])
    pts = native.build_points(coords, geo)
    t = pa.table({"fid": pa.array([1, 2, 3], pa.int64())}).append_column(
        geo.field("geometry"), pts
    )
    out = str(tmp_path / "gj")
    manifest = sources.write_geojsonl(
        rd.from_arrow(t), out, "geometry", geo, property_cols=("fid",)
    ).to_pandas()
    assert manifest["rows"].sum() == 3
    files = sorted(str(p) for p in (tmp_path / "gj").glob("*.geojsonl"))
    got = pa.concat_tables(
        sources.read_geojsonl(
            files, target=geo, out_col="geometry",
            properties={"fid": pa.int64()},
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("fid")
    assert got["fid"].to_pylist() == [1, 2, 3]
    # coordinates bit-exact after the full sink->source round trip
    back_pts = got["geometry"].combine_chunks()
    assert wkt.encode(back_pts, geo).to_pylist() == wkt.encode(
        pts, geo
    ).to_pylist()
