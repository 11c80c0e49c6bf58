"""Property-based round-trip tests (hypothesis): random geometries must
survive native → WKT → native → WKB → native bit-identically, across
all dimension sets; plus the box→polygon cast fixture."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from georay import kernels
from georay.codecs import native, wkb, wkt
from georay.types import Dimensions, GeometryType, GeoType

# precision-16 FIXED notation — like the reference's GeoArrowPrintDouble
# (src/geoarrow.c:6331-6341) — quantizes values needing >16 fractional
# digits, so the EXACT round-trip domain is "shortest repr ≤16 decimals".
# Coordinates rounded to 6 decimals (µdeg precision) sit safely inside it.
finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
).map(lambda x: round(x, 6))


def coords_strategy(ndim, min_rows=1, max_rows=8):
    return st.lists(
        st.tuples(*([finite] * ndim)), min_size=min_rows, max_size=max_rows
    ).map(lambda rows: np.asarray(rows, dtype=np.float64))


def _roundtrip_check(nat, geo):
    txt = wkt.encode(nat, geo)
    nat2, t2 = wkt.decode(txt, geo)
    v1, v2 = native.view(nat, geo), native.view(nat2, t2)
    assert np.allclose(v1.coords, v2.coords, rtol=0, atol=0, equal_nan=True)
    assert all(np.array_equal(a, b) for a, b in zip(v1.offsets, v2.offsets))
    binr = wkb.encode(nat2, t2)
    nat3, t3 = wkb.decode(binr, geo)
    v3 = native.view(nat3, t3)
    assert np.array_equal(
        np.nan_to_num(v1.coords, nan=-9e99), np.nan_to_num(v3.coords, nan=-9e99)
    )


@settings(max_examples=40, deadline=None)
@given(
    coords=coords_strategy(2, min_rows=1, max_rows=6),
    dims=st.sampled_from([Dimensions.XY, Dimensions.XYZ, Dimensions.XYM, Dimensions.XYZM]),
)
def test_point_roundtrip_property(coords, dims):
    nd = dims.count
    c = np.column_stack([coords[:, 0]] * nd)[:, :nd]
    c[:, 1] = coords[:, 1]
    geo = GeoType.point(dimensions=dims)
    nat = native.build_points(c, geo)
    _roundtrip_check(nat, geo)


@settings(max_examples=30, deadline=None)
@given(coords=coords_strategy(2, min_rows=2, max_rows=12))
def test_linestring_roundtrip_property(coords):
    geo = GeoType.linestring()
    nat = native.build_nested(coords, [np.array([0, coords.shape[0]])], geo)
    _roundtrip_check(nat, geo)


@settings(max_examples=30, deadline=None)
@given(
    rings=st.lists(coords_strategy(2, min_rows=4, max_rows=8), min_size=1, max_size=3)
)
def test_polygon_roundtrip_property(rings):
    # close each ring
    closed = [np.vstack([r, r[:1]]) for r in rings]
    coords = np.vstack(closed)
    ring_off = np.concatenate([[0], np.cumsum([c.shape[0] for c in closed])])
    geo = GeoType.polygon()
    nat = native.build_nested(
        coords, [np.array([0, len(closed)]), ring_off], geo
    )
    _roundtrip_check(nat, geo)


@settings(max_examples=30, deadline=None)
@given(data=st.lists(st.tuples(finite, finite, finite, finite), min_size=1, max_size=6))
def test_wkb_bigendian_decode_property(data):
    import struct

    # build big-endian WKB linestrings by hand; decode must byte-swap
    bufs = []
    for x0, y0, x1, y1 in data:
        bufs.append(
            struct.pack(">BII", 0, 2, 2)
            + struct.pack(">dddd", x0, y0, x1, y1)
        )
    arr = pa.array(bufs, pa.binary())
    nat, t = wkb.decode(arr, GeoType.linestring())
    v = native.view(nat, t)
    exp = np.asarray(data, dtype=np.float64).reshape(-1, 2)
    assert np.array_equal(v.coords, exp)


def test_box_to_polygon_cast_fixture():
    # /root/reference/tests/testthat/test-pkg-wk.R:234-239
    st_box = GeoType.box().storage_type()
    arr = pa.StructArray.from_arrays(
        [
            pa.array([0.0, 5.0, 0.0]),
            pa.array([1.0, 5.0, 0.0]),
            pa.array([2.0, 2.0, 1.0]),
            pa.array([3.0, 3.0, 1.0]),
        ],
        fields=[st_box.field(i) for i in range(4)],
        mask=pa.array([False, False, True]),
    )
    poly = kernels.cast(arr, GeoType.polygon(), GeoType.box())
    out = wkt.encode(poly, GeoType.polygon()).to_pylist()
    assert out == ["POLYGON ((0 1, 2 1, 2 3, 0 3, 0 1))", "POLYGON EMPTY", None]


@settings(max_examples=25, deadline=None)
@given(x=finite)
def test_format_double_roundtrips(x):
    # precision-16 text must parse back to the same double (shortest
    # round-trip property of the Ryu-compatible formatter)
    s = wkt.format_double(x, 16)
    assert float(s) == x


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
            st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_s2_sql_replica_matches_numpy(pts):
    """The DuckDB SQL replica of the S2 cell codec (tpch._s2_parent_sql)
    must agree with cells.cell_from_lonlat/cell_parent on arbitrary
    coordinates, not just the synthetic oracle grid. (cos/sin ulp drift
    between numpy and DuckDB only matters within ~1e-11 of a floor/face
    boundary — astronomically unlikely for random floats.)"""
    import duckdb
    import numpy as np

    from georay import cells
    from georay.tpch import _s2_parent_sql

    lon = np.array([p[0] for p in pts], dtype=np.float64)
    lat = np.array([p[1] for p in pts], dtype=np.float64)
    ids = cells.cell_from_lonlat(lon, lat, 12)
    expect = cells.to_i64(cells.cell_parent(ids, 6))

    con = duckdb.connect()
    con.register(
        "pts_tbl",
        __import__("pandas").DataFrame({"lon": lon, "lat": lat}),
    )
    sql = _s2_parent_sql(6, "SELECT lon, lat FROM pts_tbl")
    got = con.execute(f"SELECT cell_parent FROM ({sql})").df()["cell_parent"].to_numpy()
    assert np.array_equal(got, expect), (lon[got != expect], lat[got != expect])


def _geohash_ref(lon: float, lat: float, precision: int) -> str:
    """Textbook bisection geohash (public algorithm) as the oracle."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[5 * i : 5 * i + 5]:
            v = (v << 1) | b
        out.append(alphabet[v])
    return "".join(out)


@settings(max_examples=120, deadline=None)
@given(
    st.tuples(
        st.floats(min_value=-180.0, max_value=179.999999),
        st.floats(min_value=-90.0, max_value=89.999999),
    )
)
def test_geohash_matches_bisection_reference(pt):
    lon, lat = pt
    from georay import cells as c

    got = c.geohash(np.array([lon]), np.array([lat]), 6).to_pylist()[0]
    want = _geohash_ref(lon, lat, 6)
    # floor-scale and bisection agree except exactly on cell boundaries
    # hit by float rounding; the scaled-integer formulation is the
    # engine's (and the SQL oracle's) canonical definition
    ix_exact = (lon + 180.0) / 360.0 * (1 << 15)
    iy_exact = (lat + 90.0) / 180.0 * (1 << 15)
    on_edge = ix_exact == np.floor(ix_exact) or iy_exact == np.floor(iy_exact)
    if not on_edge:
        assert got == want


@settings(max_examples=300, deadline=None)
@given(x=st.floats(allow_nan=True, allow_infinity=True))
def test_format_double_fast_equals_slow(x):
    from georay.codecs.wkt import _format_double_fast, format_double

    assert _format_double_fast(x) == format_double(x, 16)


# ------------------------------------------------- session-4 kernels


def _lev_ref(a: str, b: str) -> int:
    """Textbook Levenshtein (reference oracle for the vectorized DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcXY 01", max_size=24),
            st.text(alphabet="abcXY 01", max_size=24),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_edit_distance_batch_matches_reference(pairs):
    from georay.stages.dedup import edit_distance_batch

    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    got = edit_distance_batch(a, b).tolist()
    assert got == [_lev_ref(x, y) for x, y in pairs]


@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_convex_hull_invariants(xs):
    from georay.analytics import _convex_hull_xy

    rng = np.random.default_rng(0)
    x = np.asarray(xs, dtype=np.float64)
    y = (x * 7 % 11) + rng.standard_normal(x.shape[0]) * 0  # deterministic
    if x.shape[0] == 0:
        return
    hull = _convex_hull_xy(x, y)
    # hull vertices are input points; every point is inside or on hull
    if hull.shape[0] >= 3:
        hx, hy = x[hull], y[hull]
        ex, ey = np.roll(hx, -1) - hx, np.roll(hy, -1) - hy
        for px, py in zip(x, y):
            cross = ex * (py - hy) - ey * (px - hx)
            assert (cross >= -1e-9).all()
    else:
        # degenerate hull (<3 vertices) ⟺ all points collinear
        if x.shape[0] >= 2:
            i0 = int(np.lexsort((y, x))[0])
            dx, dy = x - x[i0], y - y[i0]
            j = int(np.argmax(dx * dx + dy * dy))
            cross = dx * dy[j] - dy * dx[j]
            assert np.allclose(cross, 0.0, atol=1e-9)


@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100).map(lambda x: round(x, 3)),
            st.floats(-100, 100).map(lambda x: round(x, 3)),
        ),
        min_size=2,
        max_size=40,
    ),
    st.floats(0.01, 5.0),
)
@settings(max_examples=60, deadline=None)
def test_dp_keep_error_bound_property(pts, eps):
    """Douglas–Peucker guarantee: every DROPPED point lies within eps
    of the simplified polyline (distance to the chord between its
    surrounding kept points)."""
    from georay.analytics import _dp_keep

    xy = np.asarray(pts, dtype=np.float64)
    x, y = xy[:, 0], xy[:, 1]
    keep = _dp_keep(x, y, eps * eps)
    assert keep[0] and keep[-1]
    kept = np.nonzero(keep)[0]
    for i in np.nonzero(~keep)[0]:
        a = kept[kept < i].max()
        b = kept[kept > i].min()
        dx, dy = x[b] - x[a], y[b] - y[a]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (x[i] - x[a]) ** 2 + (y[i] - y[a]) ** 2
        else:
            t = min(1.0, max(0.0, ((x[i] - x[a]) * dx + (y[i] - y[a]) * dy) / L2))
            d2 = (x[i] - (x[a] + t * dx)) ** 2 + (y[i] - (y[a] + t * dy)) ** 2
        assert d2 <= eps * eps + 1e-9


@given(
    st.integers(1, 200).map(lambda n: n),
    st.integers(1, 40),
    st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_blocked_nearest_matches_full_matrix(n_pts, n_segs, seed):
    """The chunked running-min argmin is bit-identical to the
    un-chunked full-matrix argmin for ANY chunk sizes."""
    from georay.joins import _blocked_nearest

    rng = np.random.default_rng(seed)
    px = rng.uniform(-50, 50, n_pts)
    py = rng.uniform(-50, 50, n_pts)
    sid = np.arange(n_segs, dtype=np.int64)
    ax = rng.uniform(-50, 50, n_segs)
    ay = rng.uniform(-50, 50, n_segs)
    dxs = rng.uniform(0.1, 5.0, n_segs)
    dys = rng.uniform(-5.0, 5.0, n_segs)
    len2 = dxs * dxs + dys * dys
    ref_seg, ref_d2 = _blocked_nearest(
        px, py, sid, ax, ay, dxs, dys, len2, 10**9, 10**9
    )
    got_seg, got_d2 = _blocked_nearest(
        px, py, sid, ax, ay, dxs, dys, len2, 3, 2
    )
    assert np.array_equal(ref_seg, got_seg)
    assert np.array_equal(ref_d2.view(np.int64), got_d2.view(np.int64))


@given(st.floats(-179, 179), st.floats(-84, 84), st.integers(4, 10))
@settings(max_examples=60, deadline=None)
def test_uncompact_arithmetic_enumerates_exact_descendants(lon, lat, lvl):
    """The arithmetic-progression descendant formula (uncompact_cells)
    enumerates EXACTLY the level-(l+2) cells whose parent is the cell —
    first = c - s_l + s_T, step 2·s_T, count 4^(T-l)."""
    from georay import cells

    c = cells.cell_from_lonlat(np.array([lon]), np.array([lat]), lvl)[0]
    T = lvl + 2
    s_l = np.uint64(1 << (60 - 2 * lvl))
    s_t = np.uint64(1 << (60 - 2 * T))
    first = c - s_l + s_t
    kids = first + np.uint64(2) * s_t * np.arange(16, dtype=np.uint64)
    assert np.all(cells.cell_level(kids) == T)
    assert np.all(cells.cell_parent(kids, lvl) == c)
    # and they are all DISTINCT, i.e. the full 4^2 descendant set
    assert len(set(kids.tolist())) == 16


# ---- rank-statistics cross-checks (random inputs vs brute force) ----

def _brute_rank2(v):
    """Doubled average rank, brute force."""
    import numpy as np

    v = np.asarray(v)
    out = np.empty(len(v), dtype=np.int64)
    for i, x in enumerate(v):
        less = int((v < x).sum())
        eq = int((v == x).sum())
        # ranks less+1 .. less+eq ; doubled average = 2*less + eq + 1
        out[i] = 2 * less + eq + 1
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=2,
        max_size=24,
    )
)
@settings(max_examples=12, deadline=None)
def test_spearman_kendall_theilsen_vs_brute(rows):
    """grouped_spearman / grouped_kendall / grouped_theil_sen against an
    O(n²) brute-force reference on random small integer inputs (heavy
    ties by construction)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from georay import ops

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    k = np.array([r[0] for r in rows], np.int64)
    x = np.array([r[1] for r in rows], np.float64)
    y = np.array([r[2] for r in rows], np.float64)
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    ds = rd.from_arrow(t)

    sp = {r["k"]: r for r in ops.grouped_spearman(
        ds, "k", "x", "y", quantize_x=1.0, quantize_y=1.0).take_all()}
    kd = {r["k"]: r for r in ops.grouped_kendall(
        ds, "k", "x", "y", quantize_x=1.0, quantize_y=1.0).take_all()}
    tsn = {r["k"]: r for r in ops.grouped_theil_sen(
        ds, "k", "x", "y", quantize_x=1.0, quantize_y=1.0).take_all()}

    for kk in np.unique(k):
        sel = k == kk
        xs, ys = x[sel].astype(np.int64), y[sel].astype(np.int64)
        n = int(sel.sum())
        # spearman via brute doubled ranks
        rx, ry = _brute_rank2(xs), _brute_rank2(ys)
        r = sp[kk]
        assert r["n_pairs"] == n
        assert r["cov_num"] == n * int((rx * ry).sum()) - int(rx.sum()) * int(ry.sum())
        assert r["var_x"] == n * int((rx * rx).sum()) - int(rx.sum()) ** 2
        assert r["var_y"] == n * int((ry * ry).sum()) - int(ry.sum()) ** 2
        # kendall via brute pairs
        conc = disc = tx = ty = txy = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                dx, dy = int(xs[j] - xs[i]), int(ys[j] - ys[i])
                if dx and dy:
                    conc += (dx > 0) == (dy > 0)
                    disc += (dx > 0) != (dy > 0)
                elif dx == 0 and dy == 0:
                    txy += 1
                elif dx == 0:
                    tx += 1
                else:
                    ty += 1
                if dx:
                    slopes.append(dy / dx)
        if n >= 2:
            kr = kd[kk]
            assert (kr["conc"], kr["disc"]) == (conc, disc)
            assert (kr["tie_x"], kr["tie_y"], kr["tie_xy"]) == (tx, ty, txy)
        else:
            assert kk not in kd  # no pairs -> key absent
        if slopes:
            s = sorted(slopes)
            m = len(s)
            exp = (s[(m - 1) // 2] + s[m // 2]) / 2.0
            tr = tsn[kk]
            assert tr["n_slopes"] == m and tr["slope"] == exp
        else:
            assert kk not in tsn


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_rectangle_count_vs_brute(pairs):
    """rectangle_count (both plans) against an O(n⁴) brute 4-cycle
    enumeration on random small graphs."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import ray
    from georay import analytics

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    e = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    a = np.array([p[0] for p in e], np.int64)
    b = np.array([p[1] for p in e], np.int64)
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    got = analytics.rectangle_count(ds).to_pandas()["n_rectangles"][0]
    got_dist = analytics.rectangle_count(
        ds, local_edge_cutoff=0
    ).to_pandas()["n_rectangles"][0]
    es = set(e) | {(y, x) for x, y in e}
    nodes = sorted({n for p in es for n in p})
    brute = 0
    for quad in itertools.combinations(nodes, 4):
        for perm in itertools.permutations(quad[1:]):
            ring = (quad[0],) + perm
            if all((ring[i], ring[(i + 1) % 4]) in es for i in range(4)):
                brute += 1
    assert got == got_dist == brute // 2


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=-6, max_value=6),
            st.integers(min_value=-6, max_value=6),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None)
def test_path_self_intersections_vs_brute(rows):
    """path_self_intersections against a direct per-pair orientation
    check on random small integer paths (heavy collinearity)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import ray
    from georay import analytics

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    k = np.array([r[0] for r in rows], np.int64)
    x = np.array([r[1] for r in rows], np.float64)
    y = np.array([r[2] for r in rows], np.float64)
    ts = np.arange(len(rows), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k), "t": pa.array(ts),
        "x": pa.array(x), "y": pa.array(y),
    }))
    got = {
        r["k"]: r["n_self_crossings"]
        for r in analytics.path_self_intersections(
            ds, "k", "t", "x", "y", n_buckets=2
        ).take_all()
    }

    def cross(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    for kk in np.unique(k):
        sel = np.nonzero(k == kk)[0]  # ts order == row order
        qx = np.floor(x[sel] * 20.0 + 0.5).astype(np.int64)
        qy = np.floor(y[sel] * 20.0 + 0.5).astype(np.int64)
        segs = [
            (qx[i], qy[i], qx[i + 1], qy[i + 1])
            for i in range(len(sel) - 1)
        ]
        n = 0
        for i in range(len(segs)):
            for j in range(i + 2, len(segs)):
                a0, a1, b0, b1 = segs[i]
                c0, c1, d0, d1 = segs[j]
                d1_ = cross(a0, a1, b0, b1, c0, c1)
                d2_ = cross(a0, a1, b0, b1, d0, d1)
                d3_ = cross(c0, c1, d0, d1, a0, a1)
                d4_ = cross(c0, c1, d0, d1, b0, b1)
                if d1_ * d2_ < 0 and d3_ * d4_ < 0:
                    n += 1
        assert got[kk] == n


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=-8, max_value=8),
            st.integers(min_value=-8, max_value=8),
        ),
        min_size=2,
        max_size=16,
    )
)
@settings(max_examples=10, deadline=None)
def test_hausdorff_pairs_vs_brute(rows):
    """hausdorff_pairs (single group) against the direct double-loop
    definition."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import ray
    from georay import analytics

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    k = np.array([r[0] for r in rows], np.int64)
    x = np.array([r[1] for r in rows], np.float64)
    y = np.array([r[2] for r in rows], np.float64)
    ts = np.arange(len(rows), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k), "t": pa.array(ts), "e": pa.array(ts),
        "x": pa.array(x), "y": pa.array(y),
    }))
    got = {
        (r["user_a"], r["user_b"]): r["hausdorff_q"]
        for r in analytics.hausdorff_pairs(
            ds, "k", "t", "x", "y",
            group_fn=lambda a, b: np.zeros(a.shape[0], np.int64),
            tiebreak_col="e", n_buckets=2,
        ).take_all()
    }
    users = sorted(np.unique(k))

    def directed(pa_, pb_):
        return max(
            min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in pb_)
            for ax, ay in pa_
        )

    import itertools

    for ua, ub in itertools.combinations(users, 2):
        A = [(x[i], y[i]) for i in np.nonzero(k == ua)[0]]
        B = [(x[i], y[i]) for i in np.nonzero(k == ub)[0]]
        h2 = max(directed(A, B), directed(B, A))
        exp = int(np.floor(np.sqrt(h2) * (1 << 20) + 0.5))
        assert got[(ua, ub)] == exp
    assert len(got) == len(users) * (len(users) - 1) // 2


@settings(max_examples=15, deadline=None)
@given(
    xs=st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1, max_size=40,
    ),
    q=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_radix_select_matches_sort(ray_session, xs, q):
    """exact_quantiles_radix == the sorted-array definition for ANY
    float64 multiset (±inf, ±0, NaN excluded) and ANY q."""
    import ray.data as rd

    from georay import ops

    t = pa.table({"x": pa.array(xs, pa.float64())})
    out = ops.exact_quantiles_radix(rd.from_arrow(t), "x", [q]).to_pandas()
    clean = np.array([v for v in xs if not np.isnan(v)], np.float64)
    got = out["v"].iloc[0]
    if clean.shape[0] == 0:
        assert np.isnan(got)
        return
    ref = np.sort(clean)[max(int(np.ceil(q * clean.shape[0])) - 1, 0)]
    assert got == ref or (np.isnan(got) and np.isnan(ref))


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=20),     # ts
            st.one_of(st.none(),
                      st.integers(min_value=-1000, max_value=1000)),
        ),
        min_size=1, max_size=40,
    ),
)
def test_clamped_cumsum_matches_recurrence(ray_session, rows):
    """window_clamped_cumsum's closed form == the sequential
    l = max(l + (d or 0), 0) recurrence for any keyed int sequence
    (ties broken by a unique tiebreak column, NULL deltas skip)."""
    import ray.data as rd

    from georay import ops

    ks = [r[0] for r in rows]
    ts = [r[1] for r in rows]
    vs = [r[2] for r in rows]
    rid = list(range(len(rows)))
    t = pa.table({
        "k": pa.array(ks, pa.int64()), "t": pa.array(ts, pa.int64()),
        "r": pa.array(rid, pa.int64()), "v": pa.array(vs, pa.int64()),
    })
    out = (
        ops.window_clamped_cumsum(rd.from_arrow(t), "k", ["t"], "v",
                                  out_col="lvl", order_tiebreak="r")
        .to_pandas().sort_values(["k", "t", "r"])
    )
    # sequential reference in the same (k, t, r) order
    import collections

    level = collections.defaultdict(int)
    want = {}
    for k, tt, r, v in sorted(zip(ks, ts, rid, vs),
                              key=lambda z: (z[0], z[1], z[2])):
        level[k] = max(level[k] + (v or 0), 0)
        want[r] = level[k]
    got = dict(zip(out["r"], out["lvl"]))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    strs=st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=9),
        min_size=2, max_size=14,
    ),
    k=st.integers(min_value=1, max_value=2),
)
def test_editdist_join_property(ray_session, strs, k):
    """Property (r5): editdist_join_qgram over ANY small-alphabet
    string set equals the per-pair brute force — the tiny alphabet
    forces repeated q-grams (the positional-multiset case), short
    strings, empties and whitespace through the sentinel band."""
    import itertools

    import ray.data as rd

    from georay.stages.text import editdist_join_qgram

    def lev(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, lb + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[lb]

    t = pa.table({
        "id": pa.array(np.arange(len(strs)), pa.int64()),
        "name": pa.array(strs, pa.string()),
    })
    got = editdist_join_qgram(rd.from_arrow(t), "id", "name", k=k).to_pandas()
    g = (
        set(zip(got["id_a"], got["id_b"], got["dist"]))
        if len(got)
        else set()  # Ray 2.49 drops columns on an all-empty dataset
    )
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(strs), 2)
        if lev(a, b) <= k
    }
    assert g == want
