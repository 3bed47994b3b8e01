"""Property-based tests (hypothesis) for the pure-numpy kernels — the codec
and index invariants the whole engine rests on, probed over generated inputs
rather than fixture points."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openpoiservice_spark import captions, cells, geo

# text that stresses the escaping: includes the escape chars themselves
_tag_text = st.text(
    alphabet=st.sampled_from(list("ab%;=% 25B3D\x01é")), min_size=0, max_size=12
)
_tags = st.dictionaries(
    st.text(alphabet=st.sampled_from(list("abc%;=_")), min_size=1, max_size=8),
    _tag_text, max_size=5,
)


@given(osm_type=st.integers(0, 3), osm_id=st.integers(0, 2**62), tags=_tags)
@settings(max_examples=200, deadline=None)
def test_caption_roundtrip_property(osm_type, osm_id, tags):
    cap = captions.encode_caption(osm_type, osm_id, tags)
    t, i, tg = captions.decode_caption(cap)
    assert (t, i) == (osm_type, osm_id)
    # keys colliding with the header fields are consumed by the header parse;
    # the synthesizer never emits them (canonical contract)
    expected = {k: v for k, v in tags.items() if k not in ("osm_type", "osm_id")}
    assert tg == expected


_lon = st.floats(min_value=-179.999, max_value=179.999,
                 allow_nan=False, allow_infinity=False)
_lat = st.floats(min_value=-89.999, max_value=89.999,
                 allow_nan=False, allow_infinity=False)


@given(lon=_lon, lat=_lat, res=st.integers(0, cells.MAX_RES))
@settings(max_examples=200, deadline=None)
def test_cell_contains_its_point(lon, lat, res):
    """Containment up to 1 ulp of the bin boundary: floor((x+180)/360*n) can
    round a boundary-adjacent float into the neighbouring bin — inherent to
    any floor binning and IDENTICAL in the DuckDB oracle (cross-engine
    agreement, not sub-ulp geometry, is the correctness contract)."""
    eps = 1e-9  # ~0.1 mm
    c = int(cells.cell_of(lon, lat, res))
    mnx, mny, mxx, mxy = cells.cell_bounds(c)
    assert mnx - eps <= lon < mxx + eps or (lon == 180.0 and mxx == 180.0)
    assert mny - eps <= lat < mxy + eps or (lat == 90.0 and mxy == 90.0)


@given(lon=_lon, lat=_lat,
       res=st.integers(8, cells.MAX_RES), up=st.integers(1, 7))
@settings(max_examples=200, deadline=None)
def test_parent_contains_child(lon, lat, res, up):
    child = int(cells.cell_of(lon, lat, res))
    parent = int(cells.cell_parent(child, res - up))
    assert parent == int(cells.cell_of(lon, lat, res - up))
    pmnx, pmny, pmxx, pmxy = cells.cell_bounds(parent)
    cmnx, cmny, cmxx, cmxy = cells.cell_bounds(child)
    assert pmnx <= cmnx and pmny <= cmny and pmxx >= cmxx and pmxy >= cmxy


@given(lon=st.floats(min_value=-10, max_value=10),
       lat=st.floats(min_value=40, max_value=60),
       dx=st.floats(min_value=0.01, max_value=2.0),
       dy=st.floats(min_value=0.01, max_value=2.0),
       res=st.integers(4, 12))
@settings(max_examples=100, deadline=None)
def test_cover_bbox_superset(lon, lat, dx, dy, res):
    """Every point of the box maps to a cell in the box's cover (sampled)."""
    cover = set(cells.cover_bbox(lon, lat, lon + dx, lat + dy, res).tolist())
    rng = np.random.default_rng(0)
    px = rng.uniform(lon, lon + dx, 50)
    py = rng.uniform(lat, lat + dy, 50)
    assert set(cells.cell_of(px, py, res).tolist()) <= cover


@given(px=st.floats(min_value=8.795, max_value=8.825),
       py=st.floats(min_value=53.065, max_value=53.095))
@settings(max_examples=200, deadline=None)
def test_donut_membership_consistency(px, py):
    """within_m(0) on a donut == (inside outer) and not (inside hole), and
    distance is 0 exactly on membership."""
    ring = [[8.80, 53.07], [8.82, 53.07], [8.82, 53.09], [8.80, 53.09], [8.80, 53.07]]
    hole = [[8.807, 53.077], [8.813, 53.077], [8.813, 53.083], [8.807, 53.083],
            [8.807, 53.077]]
    g = geo.GeomSpec("polygon", ring, holes=[hole])
    x, y = geo.local_xy([px], [py], g.lon0, g.lat0)
    in_outer = geo.point_in_ring(x, y, g._xy)[0]
    in_hole = geo.point_in_ring(x, y, g._holes_xy[0])[0]
    member = bool(in_outer and not in_hole)
    assert bool(g.within_m([px], [py], 0.0)[0]) == member
    assert (g.distance_m([px], [py])[0] == 0.0) == member


@given(lon1=_lon, lat1=_lat, lon2=_lon, lat2=_lat)
@settings(max_examples=200, deadline=None)
def test_vincenty_properties_random_pairs(lon1, lat1, lon2, lat2):
    """Spheroidal inverse invariants over arbitrary pairs: symmetric,
    non-negative, zero iff coincident, within [haversine*(1-1%), *(1+1%)]
    of the spherical distance (flattening bound with slack for the
    near-antipodal fallback region)."""
    d = float(geo.vincenty_m(lon1, lat1, lon2, lat2)[0])
    drev = float(geo.vincenty_m(lon2, lat2, lon1, lat1)[0])
    assert abs(d - drev) <= 1e-6  # reversed iteration rounds ~1 ulp apart
    assert d >= 0.0
    hav = float(geo.haversine_m(lon1, lat1, lon2, lat2))
    if hav > 1.0:
        assert abs(d - hav) / hav < 0.01
    if (lon1, lat1) == (lon2, lat2):
        assert d == 0.0


@given(lon=st.floats(min_value=-360.0, max_value=360.0,
                     allow_nan=False, allow_infinity=False),
       width=st.floats(min_value=0.01, max_value=350.0,
                       allow_nan=False, allow_infinity=False),
       lat=st.floats(min_value=-80.0, max_value=80.0,
                     allow_nan=False, allow_infinity=False),
       res=st.integers(2, 8))
@settings(max_examples=150, deadline=None)
def test_cover_bbox_wrap_superset(lon, width, lat, res):
    """Antimeridian cover invariant: for ANY continuous-frame lon range
    (possibly extending past ±180 in either direction), every in-range
    point's cell is covered after wrapping the point into [-180, 180)."""
    lo, hi = lon, lon + width
    cover = set(cells.cover_bbox(lo, lat - 0.5, hi, lat + 0.5, res).tolist())
    assert cover
    rng = np.random.default_rng(1)
    pts = rng.uniform(lo, hi, 40)
    wrapped = np.mod(pts + 180.0, 360.0) - 180.0
    cs = cells.cell_of(wrapped, np.full(40, lat), res)
    assert set(cs.tolist()) <= cover


@given(g0=st.integers(-600, 2**21 * 256 + 600),
       extent=st.integers(1, 96),
       z=st.integers(0, 21))
@settings(max_examples=200, deadline=None)
def test_tile_axis_clamp_invariants(g0, extent, z):
    """Per-axis tile-span invariants at any grid edge: counts are
    non-negative and sum to the CLIPPED extent; every emitted tile id with
    a positive count lies in [0, 2^z)."""
    from openpoiservice_spark import imaging

    scale = (1 << z) * 256
    lo = max(min(g0, scale), 0)
    hi = max(min(g0 + extent, scale), 0)
    # reuse the module's axis math through raster_tile_spans' shape by
    # computing directly what it computes per axis
    g0a = np.array([g0], dtype=np.int64)
    exta = np.array([extent], dtype=np.int64)
    g0c = np.clip(g0a, 0, scale)
    g1c = np.clip(g0a + exta, 0, scale)
    off = np.maximum(g0c - g0a, 0)
    ext = g1c - g0c
    tA = g0c // 256
    nA = np.minimum((tA + 1) * 256 - g0c, ext)
    nB = ext - nA
    assert nA[0] >= 0 and nB[0] >= 0
    assert nA[0] + nB[0] == hi - lo
    n = 1 << z
    if nA[0] > 0:
        assert 0 <= tA[0] < n
    if nB[0] > 0:
        assert 0 <= tA[0] + 1 < n
    assert off[0] >= 0


@given(
    cx=st.floats(-170.0, 170.0, allow_nan=False),
    cy=st.floats(-65.0, 65.0, allow_nan=False),
    a=st.floats(0.02, 0.4, allow_nan=False),
    b=st.floats(0.02, 0.25, allow_nan=False),
    buf=st.floats(0.0, 20_000.0, allow_nan=False),
    res=st.integers(8, 14),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=120, deadline=None)
def test_cover_geometry_superset_property(cx, cy, a, b, buf, res, seed):
    """Batch-join soundness foundation: any point the exact refine accepts
    (within_m(buf)) must map to a cell in cover_geometry's cover — over
    random convex polygons, buffers, and resolutions in the service's
    operating envelope.  (The cover may over-include — the refine handles
    that; it must never under-include.)"""
    rng = np.random.default_rng(seed)
    angles = np.sort(rng.random(5)) * 2.0 * np.pi
    ring = [(cx + a * np.cos(t), cy + b * np.sin(t)) for t in angles]
    spec = geo.GeomSpec("polygon", list(ring) + [ring[0]])
    cover = set(cells.cover_geometry(spec, buf, res).tolist())
    assert cover, "cover must not be empty for a non-degenerate polygon"
    # sample points around the geometry's buffered bounds
    mnx, mny, mxx, mxy = spec.buffered_bounds(buf)
    px = rng.uniform(mnx - 0.05, mxx + 0.05, 300)
    py = rng.uniform(max(mny - 0.05, -89.9), min(mxy + 0.05, 89.9), 300)
    px_wrapped = ((px + 180.0) % 360.0) - 180.0
    inside = spec.within_m(px, py, buf)
    cells_of = cells.cell_of(px_wrapped, py, res)
    missed = [
        (float(px[i]), float(py[i]))
        for i in range(len(px))
        if inside[i] and int(cells_of[i]) not in cover
    ]
    assert not missed, missed[:3]


@given(
    events=st.lists(st.integers(0, 100_000), min_size=0, max_size=60),
    gap=st.integers(1, 5_000),
    n_batches=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=300, deadline=None)
def test_session_fusion_order_independent(events, gap, n_batches, seed):
    """The update-mode sessionizer's core invariant: incrementally fusing
    events in ANY batch split equals one-shot batch sessionization over the
    sorted event list (so late/out-of-order arrival cannot change the final
    session set)."""
    from openpoiservice_spark.streaming import fuse_sessions

    # one-shot reference: sort all events, walk with the gap rule
    ref = fuse_sessions([(t, t, 1) for t in events], gap)

    # incremental: random permutation, random batch boundaries, fold
    rng = np.random.default_rng(seed)
    perm = list(events)
    rng.shuffle(perm)
    cuts = sorted(rng.integers(0, len(perm) + 1, size=n_batches - 1).tolist())
    state: list = []
    prev = 0
    for cut in cuts + [len(perm)]:
        batch = perm[prev:cut]
        prev = cut
        state = fuse_sessions(state + [(t, t, 1) for t in batch], gap)
    assert state == ref
    # counts conserve events
    assert sum(n for _, _, n in state) == len(events)
