"""Cell-index unit tests (numpy oracles + DuckDB cross-checks)."""

import duckdb
import numpy as np
import pytest

from georay import cells


def rand_lonlat(n, seed=0):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, n)
    # uniform on sphere for lat
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, n)))
    return lon, lat


def test_cell_roundtrip_center_stays_in_cell():
    lon, lat = rand_lonlat(20_000, seed=1)
    for level in (5, 10, 15):
        ids = cells.cell_from_lonlat(lon, lat, level)
        clon, clat = cells.cell_center_lonlat(ids, level)
        ids2 = cells.cell_from_lonlat(clon, clat, level)
        assert np.array_equal(ids, ids2)


def test_cell_level_and_sentinel():
    lon, lat = rand_lonlat(1000, seed=2)
    for level in (0, 7, 15, 30):
        ids = cells.cell_from_lonlat(lon, lat, level)
        assert np.all(cells.cell_level(ids) == level)
        # sentinel bit means no valid id is 0
        assert np.all(ids != 0)


def test_cell_parent_is_prefix():
    lon, lat = rand_lonlat(5000, seed=3)
    child = cells.cell_from_lonlat(lon, lat, 15)
    parent = cells.cell_parent(child, 8)
    direct = cells.cell_from_lonlat(lon, lat, 8)
    assert np.array_equal(parent, direct)
    # children fall inside the parent's id range
    lo, hi = cells.cell_range(parent)
    assert np.all((child >= lo) & (child <= hi))


def test_cell_nan_encodes_zero():
    ids = cells.cell_from_lonlat(
        np.array([np.nan, 10.0]), np.array([np.nan, 20.0]), 15
    )
    assert ids[0] == 0
    assert ids[1] != 0


def test_cell_disk_contains_nearby_points():
    # a point slightly east of another must appear in its ring-1 disk
    rng = np.random.default_rng(4)
    level = 12
    lon, lat = rand_lonlat(2000, seed=5)
    ids = cells.cell_from_lonlat(lon, lat, level)
    # perturb by ~¼ of a cell: cell side ~ 90°/2^level in st-space
    eps = 90.0 / (1 << level) / 4
    ids_p = cells.cell_from_lonlat(
        lon + rng.uniform(-eps, eps, lon.shape),
        np.clip(lat + rng.uniform(-eps, eps, lat.shape), -89.9, 89.9),
        level,
    )
    disk = cells.cell_disk(ids, level, k=1)
    found = (disk == ids_p[:, None]).any(axis=1)
    assert found.mean() > 0.995  # corner cases may need ring 2


def test_cell_disk_crosses_face_edges():
    # points near lon=45 (face 0/1 edge): disk must include cells on both faces
    lon = np.full(50, 44.9999)
    lat = np.linspace(-40, 40, 50)
    level = 10
    ids = cells.cell_from_lonlat(lon, lat, level)
    disk = cells.cell_disk(ids, level, k=1)
    faces = (disk >> np.uint64(61)).astype(int)
    assert set(np.unique(faces)) >= {0, 1}


def test_grid_cell_matches_duckdb():
    lon, lat = rand_lonlat(5000, seed=6)
    res = 1.0
    got = cells.grid_cell(lon, lat, res)
    import pandas as pd

    con = duckdb.connect()
    df = pd.DataFrame({"lon": lon, "lat": lat})
    expected = con.execute(
        "SELECT CAST(FLOOR((lon+180)/1.0) AS BIGINT)*100000 + "
        "CAST(FLOOR((lat+90)/1.0) AS BIGINT) AS g FROM df"
    ).fetchnumpy()["g"]
    assert np.array_equal(got, expected)


def test_grid_disk_wraps_longitude():
    res = 1.0
    nx = 360
    c = cells.grid_cell(np.array([-179.5]), np.array([0.5]), res)
    disk = cells.grid_disk(c, 1, nx)
    west = cells.grid_cell(np.array([179.5]), np.array([0.5]), res)
    assert west[0] in disk[0]


def test_mercator_tile_matches_duckdb():
    lon, lat = rand_lonlat(5000, seed=7)
    zoom = 6
    tx, ty = cells.mercator_tile(lon, lat, zoom)
    import pandas as pd

    df = pd.DataFrame({"lon": lon, "lat": np.clip(lat, -85.05112877980659, 85.05112877980659)})
    con = duckdb.connect()
    q = (
        "SELECT CAST(FLOOR((lon+180)/360*64) AS BIGINT) AS tx, "
        "CAST(FLOOR((1 - LN(TAN(RADIANS(lat)) + 1/COS(RADIANS(lat)))/PI())/2*64) AS BIGINT) AS ty "
        "FROM df"
    )
    exp = con.execute(q).fetchnumpy()
    assert np.array_equal(tx, np.clip(exp["tx"], 0, 63))
    assert np.array_equal(ty, np.clip(exp["ty"], 0, 63))


def test_mercator_tile_known_values():
    # lon=0,lat=0 at zoom 1 → (1, 1); zoom 0 → (0, 0)
    tx, ty = cells.mercator_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (tx[0], ty[0]) == (1, 1)
    tx, ty = cells.mercator_tile(np.array([0.0]), np.array([0.0]), 0)
    assert (tx[0], ty[0]) == (0, 0)


def test_tile_key_unique():
    tx = np.array([0, 1, 2**29 - 1])
    ty = np.array([5, 5, 5])
    k = cells.tile_key(tx, ty, 12)
    assert len(set(k.tolist())) == 3


def test_grid_cell_nan_maps_to_sentinel():
    # null/empty point coords must not go through an undefined NaN->int
    # cast; they bucket into the explicit GRID_NULL sentinel
    import warnings

    lon = np.array([0.5, np.nan, 10.5, np.inf])
    lat = np.array([0.5, 1.0, np.nan, 2.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        got = cells.grid_cell(lon, lat, 1.0)
    exp0 = int(np.floor(180.5) * cells.GRID_MULT + np.floor(90.5))
    assert got[0] == exp0
    assert got[1] == cells.GRID_NULL
    assert got[2] == cells.GRID_NULL
    assert got[3] == cells.GRID_NULL


def test_geohash_known_values_and_nulls():
    import numpy as np

    from georay import cells

    g = cells.geohash(
        np.array([-5.6, 13.361389, -74.006, np.nan]),
        np.array([42.6, 38.115556, 40.7128, 1.0]),
        6,
    ).to_pylist()
    # pinned against the public geohash algorithm (precision-6 prefixes)
    assert g[0] == "ezs42e"
    assert g[1] == "sqc8b4"
    assert g[2].startswith("dr5reg"[:4])
    assert g[3] == "000000"  # non-finite → sentinel cell

    # prefix property: precision 4 is a prefix of precision 6
    g4 = cells.geohash(np.array([-5.6]), np.array([42.6]), 4).to_pylist()[0]
    assert g[0].startswith(g4)


def test_compact_cells_quartets_and_cascade(ray_session):
    """A complete sibling quartet promotes; 16 grandchildren CASCADE to
    one grandparent; incomplete quartets stay put."""
    import pyarrow as pa
    import ray.data as rd

    from georay import cells, ops

    # pick an arbitrary level-10 cell; derive its 16 level-12 descendants
    base = cells.cell_from_lonlat(np.array([12.3]), np.array([45.6]), 10)
    s10 = np.uint64(1 << (60 - 20))
    s12 = np.uint64(1 << (60 - 24))
    lo = base[0] - s10 + s12
    grandkids = lo + np.arange(16, dtype=np.uint64) * (np.uint64(2) * s12)
    assert np.all(cells.cell_level(grandkids) == 12)
    assert np.all(cells.cell_parent(grandkids, 10) == base[0])
    # plus 3 of 4 children of a DIFFERENT parent (incomplete)
    other = cells.cell_from_lonlat(np.array([-30.0]), np.array([10.0]), 11)
    lo2 = other[0] - np.uint64(1 << (60 - 22)) + s12
    trio = lo2 + np.arange(3, dtype=np.uint64) * (np.uint64(2) * s12)
    all_cells = cells.to_i64(np.concatenate([grandkids, trio]))
    ds = rd.from_arrow(pa.table({"cell": pa.array(all_cells, pa.int64())}))
    out = (
        ops.compact_cells(ds, "cell", from_level=12, min_level=10)
        .to_pandas().sort_values(["level", "cell"]).reset_index(drop=True)
    )
    # quartet-of-quartets collapsed to the single level-10 ancestor;
    # the trio survives at level 12
    assert out["level"].tolist() == [10, 12, 12, 12]
    assert out["cell"].iloc[0] == cells.to_i64(base)[0]
    assert set(out[out["level"] == 12]["cell"]) == set(cells.to_i64(trio).tolist())


def test_uncompact_inverts_compact(ray_session):
    """uncompact(compact(S), L) == S for a level-L cell set with both a
    promotable quartet-of-quartets and stragglers; expanding a cell
    deeper than to_level raises."""
    import pyarrow as pa
    import ray.data as rd

    from georay import cells, ops

    base = cells.cell_from_lonlat(np.array([12.3]), np.array([45.6]), 10)
    s10 = np.uint64(1 << (60 - 20))
    s12 = np.uint64(1 << (60 - 24))
    lo = base[0] - s10 + s12
    grandkids = lo + np.arange(16, dtype=np.uint64) * (np.uint64(2) * s12)
    other = cells.cell_from_lonlat(np.array([-30.0]), np.array([10.0]), 11)
    lo2 = other[0] - np.uint64(1 << (60 - 22)) + s12
    trio = lo2 + np.arange(3, dtype=np.uint64) * (np.uint64(2) * s12)
    orig = set(cells.to_i64(np.concatenate([grandkids, trio])).tolist())
    ds = rd.from_arrow(
        pa.table({"cell": pa.array(sorted(orig), pa.int64())})
    )
    comp = ops.compact_cells(ds, "cell", from_level=12, min_level=10)
    back = ops.uncompact_cells(comp, to_level=12).to_pandas()
    assert set(back["cell"]) == orig
    assert len(back) == len(orig)  # no duplicate descendants

    # a level-12 row cannot be "expanded" to level 11
    with pytest.raises(Exception):
        ops.uncompact_cells(comp, to_level=11).to_pandas()


def test_hex_cell_properties():
    """Hex binning invariants: disk sizes are the centered hexagonal
    numbers (1, 7, 19, 37), every point's cell center is within one
    hex circumradius, cube rounding keeps q+r+s == 0, non-finite
    coords map to -1."""
    import numpy as np

    from georay.cells import hex_cell, hex_disk

    rng = np.random.default_rng(5)
    x = rng.uniform(-180, 180, 20000)
    y = rng.uniform(-90, 90, 20000)
    size = 2.5
    ids = hex_cell(x, y, size)
    assert ids.min() >= 0
    # invert the packing to axial centers and check distance bound
    OFF, B = 1 << 20, 1 << 21
    q = ids // B - OFF
    r = ids % B - OFF
    cx = size * np.sqrt(3.0) * (q + r / 2.0)
    cy = size * 1.5 * r
    d = np.hypot(x - cx, y - cy)
    assert d.max() <= size + 1e-9  # circumradius = size
    for k, want in [(0, 1), (1, 7), (2, 19), (3, 37)]:
        assert hex_disk(ids[:3], k).shape == (3, want)
    bad = hex_cell(np.array([np.nan, np.inf]), np.array([0.0, 0.0]), size)
    assert (bad == -1).all()


def test_geohash_ij_matches_string_encoder():
    # the ij core and the base32 encoder must agree: re-deriving the
    # morton-interleaved value from (ix, iy) reproduces the string path
    import numpy as np

    from georay import cells

    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    ix, iy = cells.geohash_ij(lon, lat, precision=4)
    gh = cells.geohash(lon, lat, precision=4).to_pylist()
    # decode the string back to (ix, iy) via base32 -> morton deinterleave
    A = "0123456789bcdefghjkmnpqrstuvwxyz"
    for s, x, y in zip(gh, ix, iy):
        v = 0
        for ch in s:
            v = (v << 5) | A.index(ch)
        dx = dy = 0
        for b in range(10):
            dx |= ((v >> (2 * b + 1)) & 1) << b
            dy |= ((v >> (2 * b)) & 1) << b
        assert (dx, dy) == (x, y)


def test_geohash_neighbors_wrap_and_poles():
    import numpy as np

    from georay import cells

    # precision 2 -> 5 bits -> 32x32 grid
    ix = np.array([0, 31, 5], np.int64)
    iy = np.array([0, 31, 10], np.int64)
    owner, nx, ny = cells.geohash_neighbors(ix, iy, precision=2)
    per = {i: set() for i in range(3)}
    for o, a, b in zip(owner, nx, ny):
        per[int(o)].add((int(a), int(b)))
    # corner (0,0): lon wraps to 31, lat row -1 dropped -> 5 neighbors
    assert per[0] == {(31, 0), (1, 0), (31, 1), (0, 1), (1, 1)}
    # corner (31,31): wraps to 0, lat row 32 dropped -> 5 neighbors
    assert per[1] == {(30, 31), (0, 31), (30, 30), (31, 30), (0, 30)}
    # interior: full Moore 8
    assert len(per[2]) == 8
