"""Spatial join, tile assignment and dedup routing over derived tables."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from pyrosar_ray.derive import points_from_lineitem, scenes_from_orders
from pyrosar_ray.functions.geometry import bbox_ring, polygon_wkb
from pyrosar_ray.stages.dedup_scenes import mark_duplicates, split_registered
from pyrosar_ray.stages.spatial import broadcast_polygon_filter, spatial_join_points
from pyrosar_ray.stages.tiling import assign_tiles, tile_counts


@pytest.fixture(scope="module")
def scenes_tbl(sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    return scenes_from_orders(orders["o_orderkey"].to_numpy())


@pytest.fixture(scope="module")
def points_tbl(sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"])
    return points_from_lineitem(li["l_orderkey"].to_numpy(), li["l_linenumber"].to_numpy())


def brute_force_pairs(scenes_tbl, points_tbl):
    s = scenes_tbl.to_pandas()
    p = points_tbl.to_pandas()
    out = []
    for _, sc in s.iterrows():
        hit = p[
            (p.lon >= sc.xmin) & (p.lon < sc.xmax) & (p.lat >= sc.ymin) & (p.lat < sc.ymax)
        ]
        for pid in hit.point_id:
            out.append((sc.scene_key, pid))
    return sorted(out)


def test_spatial_join_matches_bruteforce(scenes_tbl, points_tbl):
    scenes = rd.from_arrow(scenes_tbl)
    points = rd.from_arrow(points_tbl)
    joined = spatial_join_points(scenes, points, num_partitions=8)
    got = sorted(
        (r["scene_key"], r["point_id"]) for r in joined.select_columns(["scene_key", "point_id"]).take_all()
    )
    assert got == brute_force_pairs(scenes_tbl, points_tbl)
    assert len(got) > 0


def test_partitioned_join_matches_broadcast(scenes_tbl, points_tbl):
    scenes = rd.from_arrow(scenes_tbl)
    points = rd.from_arrow(points_tbl)
    got = sorted(
        (r["scene_key"], r["point_id"])
        for r in spatial_join_points(
            scenes, points, strategy="partitioned", num_partitions=8
        )
        .select_columns(["scene_key", "point_id"])
        .take_all()
    )
    assert got == brute_force_pairs(scenes_tbl, points_tbl)


def test_partitioned_join_empty_sides(scenes_tbl, points_tbl):
    empty_scenes = rd.from_arrow(scenes_tbl.slice(0, 0))
    points = rd.from_arrow(points_tbl)
    out = spatial_join_points(
        empty_scenes, points, strategy="partitioned", num_partitions=4
    )
    assert out.count() == 0


def test_tile_assign_matches_scalar(scenes_tbl):
    from pyrosar_ray.functions.tiles import hgt_tiles

    scenes = rd.from_arrow(scenes_tbl)
    tiles = assign_tiles(scenes).take_all()
    df = pd.DataFrame(tiles)
    s = scenes_tbl.to_pandas().set_index("scene_key")
    # spot-check 25 scenes against the scalar reference implementation
    for key in s.index[:25]:
        sc = s.loc[key]
        expected = [t[:-4] for t in hgt_tiles(sc.xmin, sc.xmax, sc.ymin, sc.ymax)]
        got = df[df.scene_key == key]["tile"].tolist()
        assert got == expected


def test_tile_counts(scenes_tbl):
    scenes = rd.from_arrow(scenes_tbl)
    counts = tile_counts(assign_tiles(scenes)).take_all()
    total = sum(r["n_scenes"] for r in counts)
    assert total == assign_tiles(scenes).count()


def test_dedup_routing(scenes_tbl):
    scenes = rd.from_arrow(scenes_tbl)
    data, dup = split_registered(mark_duplicates(scenes))
    ndata, ndup = data.count(), dup.count()
    assert ndata + ndup == scenes_tbl.num_rows
    # winner is min(scene path) per identity group
    df = scenes_tbl.to_pandas()
    expected_dup = (
        df.sort_values("scene")
        .groupby(["outname_base", "product"])
        .apply(lambda g: g.scene.iloc[1:])
        .reset_index(drop=True)
    )
    got_dup = sorted(r["scene"] for r in dup.take_all())
    assert got_dup == sorted(expected_dup.tolist())
    # deterministic across runs
    data2, dup2 = split_registered(mark_duplicates(rd.from_arrow(scenes_tbl)))
    assert sorted(r["scene"] for r in dup2.take_all()) == got_dup


def test_broadcast_polygon_filter(scenes_tbl):
    scenes = rd.from_arrow(scenes_tbl)
    df = scenes_tbl.to_pandas()
    q = polygon_wkb(bbox_ring(-10.0, -10.0, 10.0, 10.0))
    got = broadcast_polygon_filter(scenes, q).count()
    expected = (
        (df.xmin <= 10.0) & (df.xmax >= -10.0) & (df.ymin <= 10.0) & (df.ymax >= -10.0)
    ).sum()
    assert got == expected
    assert got > 0


def test_salted_group_apply_hot_key():
    import pandas as pd

    import ray.data as rd
    from pyrosar_ray.stages.tiling import salted_group_apply

    # one hot key (90% of rows) + cold keys: salted two-phase count
    df = pd.DataFrame(
        {
            "tile": ["HOT"] * 900 + [f"c{i}" for i in range(100)],
            "n": [1] * 1000,
        }
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"tile": [g["tile"].iloc[0]], "n": [int(g["n"].sum())]})

    out = salted_group_apply(rd.from_pandas(df), "tile", combine).to_pandas()
    got = dict(zip(out["tile"], out["n"]))
    assert got["HOT"] == 900 and got["c0"] == 1 and len(got) == 101


def test_auto_num_partitions(ray_session, sf_dir):
    import ray.data

    from pyrosar_ray.stages.spatial import auto_num_partitions, estimate_input_bytes

    scenes = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    points = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    sz = estimate_input_bytes(points)
    assert sz is not None and sz > 0
    n = auto_num_partitions(scenes, points)
    assert 8 <= n <= 4096
    # small inputs clamp to the floor; a huge target drives it there too
    assert auto_num_partitions(scenes, points, target_partition_bytes=1 << 40) == 8
    # non-file-backed lineage falls back to the caller default
    synth = ray.data.range(10)
    assert auto_num_partitions(synth, points, default=33) == 33


def test_morton_key_locality_and_roundtrip():
    """Bit-interleave matches a slow reference; z-adjacent points are
    spatially near (shared prefix ⇒ same power-of-two cell)."""
    import numpy as np

    from pyrosar_ray.functions.morton import morton_key, quantize_lonlat

    rng_lon = np.array([-180.0, -179.99, 0.0, 10.123, 179.994, 180.0])
    rng_lat = np.array([-90.0, 0.0, 45.5, -45.5, 89.99, 90.0])
    z = morton_key(rng_lon, rng_lat)
    x, y = quantize_lonlat(rng_lon, rng_lat)

    def slow(xv, yv):
        out = 0
        for b in range(16):
            out |= ((int(xv) >> b) & 1) << (2 * b)
            out |= ((int(yv) >> b) & 1) << (2 * b + 1)
        return out

    assert z.tolist() == [slow(a, b) for a, b in zip(x, y)]
    # clamping: lon=180 / lat=90 stay in the top cell
    assert x[-1] == 65535 and y[-1] == 65535
    # locality: equal top-24-bit prefix => same 2^-12-scaled cell => the
    # quantized coordinates differ by < 2^4 in each axis
    lon = np.linspace(-10, 10, 4096)
    lat = np.linspace(40, 41, 4096)
    zz = morton_key(lon, lat)
    order = np.argsort(zz, kind="mergesort")
    xs, ys = quantize_lonlat(lon, lat)
    pref = zz[order] >> 8
    same = pref[1:] == pref[:-1]
    dx = np.abs(np.diff(xs[order].astype(np.int64)))
    dy = np.abs(np.diff(ys[order].astype(np.int64)))
    assert (dx[same] < 16).all() and (dy[same] < 16).all()


def test_partitioned_join_hot_cell_res_mitigation():
    """Polar/coastal hotspot shape: EVERY point lands in one 1° cell.

    The partitioned plan documents that the salted partition hash can't
    split a single ultra-hot CELL — the mitigation is bumping ``res``
    so the cell divides spatially. This pins both halves: (a) the hot
    cell produces correct output at res=0 (one giant group, still
    exact), (b) res=4 splits the same points across many cells while
    emitting the IDENTICAL pair set, byte-for-byte with broadcast.
    """
    import pandas as pd

    import ray.data as rd
    from pyrosar_ray.stages.spatial import add_point_cells, spatial_join_points

    rng = np.random.RandomState(7)
    n_pts = 4000
    # all points inside the (lon 10..11, lat 70..71) cell — one hot cell
    pts = pd.DataFrame(
        {
            "point_id": np.arange(n_pts, dtype=np.int64),
            "lon": 10.0 + rng.uniform(0.001, 0.999, n_pts),
            "lat": 70.0 + rng.uniform(0.001, 0.999, n_pts),
        }
    )
    # 50 scenes: staggered bboxes all overlapping the hot cell
    ks = np.arange(50, dtype=np.int64)
    scenes = pd.DataFrame(
        {
            "scene_key": ks,
            "xmin": 10.0 + (ks % 10) * 0.05,
            "xmax": 10.4 + (ks % 10) * 0.05,
            "ymin": 70.0 + (ks // 10) * 0.1,
            "ymax": 70.5 + (ks // 10) * 0.1,
        }
    )

    def run(strategy, res):
        out = spatial_join_points(
            rd.from_pandas(scenes).repartition(4),
            rd.from_pandas(pts).repartition(8),
            strategy=strategy,
            res=res,
            num_partitions=16,
        ).to_pandas()
        return set(zip(out["scene_key"], out["point_id"]))

    expect = run("broadcast", 0)
    assert len(expect) > n_pts  # overlapping scenes → multiple pairs/point
    assert run("partitioned", 0) == expect  # hot cell, one group, exact
    assert run("partitioned", 4) == expect  # res bump: same rows
    # the mitigation actually spreads: at res=4 the points span many cells
    cells4 = add_point_cells(rd.from_pandas(pts), res=4).to_pandas()["cell"]
    assert cells4.nunique() >= 200


def _dbscan_reference(xy, eps_cd, min_pts):
    """Brute-force deterministic DBSCAN: min-id component labels for
    cores, min neighboring core label for borders."""
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps_cd * eps_cd
    core = nbr.sum(1) >= min_pts  # includes self
    label = {}
    for i in np.flatnonzero(core):
        label[i] = i
    changed = True
    while changed:
        changed = False
        for i in np.flatnonzero(core):
            for j in np.flatnonzero(nbr[i] & core):
                if label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    rows = {}
    ids = np.arange(n) * 10 + 3  # non-trivial point ids
    for i in np.flatnonzero(core):
        rows[int(ids[i])] = (int(ids[label[i]]), 1)
    for i in np.flatnonzero(~core):
        cands = [label[j] for j in np.flatnonzero(nbr[i] & core) if j != i]
        if cands:
            rows[int(ids[i])] = (int(ids[min(cands)]), 0)
    return ids, rows


def test_dbscan_labels_with_border_points():
    """Engine DBSCAN equals brute force on a layout with real borders:
    a dense blob (cores), satellite points in eps of exactly one core
    (borders), and isolated noise."""
    from pyrosar_ray.stages.spatial import dbscan_labels

    pts_cd = np.array([
        # blob A: 5 mutually-close points (all core at min_pts=4)
        [0, 0], [30, 0], [0, 30], [30, 30], [15, 15],
        # border of blob A: within 100cd of corner points only
        [120, 0],
        # blob B across the map: 4 points pairwise within eps
        [20000, 5000], [20060, 5000], [20000, 5060], [20060, 5060],
        # border of blob B
        [20000, 5155],
        # noise
        [-15000, -7000], [-15000, -6950],
    ], dtype=np.int64)
    ids, want = _dbscan_reference(pts_cd, eps_cd=100, min_pts=4)
    df = pd.DataFrame(
        {
            "point_id": ids.astype(np.int64),
            "lon": pts_cd[:, 0] / 100.0,
            "lat": pts_cd[:, 1] / 100.0,
        }
    )
    out = (
        dbscan_labels(rd.from_pandas(df).repartition(5), radius_cd=100, min_pts=4)
        .to_pandas()
        .set_index("point_id")
    )
    assert len(out) == len(want)
    for pid, (cl, is_core) in want.items():
        assert out.loc[pid, "cluster_id"] == cl, pid
        assert out.loc[pid, "is_core"] == is_core, pid
    # sanity on the layout itself: both borders and noise are present
    assert sum(1 for _, c in want.values() if c == 0) == 2
    assert len(want) == len(pts_cd) - 2


def test_dbscan_broadcast_and_join_plans_agree():
    """The core-set broadcast classification and the semi/anti join
    fallback emit identical labelings (forced via core_broadcast_bound)."""
    from pyrosar_ray.stages.spatial import dbscan_labels

    rng = np.random.default_rng(11)
    n = 150
    df = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64) * 7 + 1,
            "lon": np.round(rng.uniform(-5, 5, n), 2),
            "lat": np.round(rng.uniform(-5, 5, n), 2),
        }
    )
    kw = dict(radius_cd=100, min_pts=4)
    a = (
        dbscan_labels(rd.from_pandas(df).repartition(4), **kw)
        .to_pandas().sort_values("point_id", ignore_index=True)
    )
    b = (
        dbscan_labels(
            rd.from_pandas(df).repartition(4), core_broadcast_bound=0, **kw
        )
        .to_pandas().sort_values("point_id", ignore_index=True)
    )
    assert len(a) > 0  # the dense toy box must cluster something
    assert a.equals(b)


@pytest.mark.parametrize("seed,box", [
    (1, (-2, 2, -2, 2)),        # around the origin (negative cells)
    (2, (176, 180, -90, -86)),  # antimeridian / pole corner
    (3, (-1.5, -0.5, 3.0, 4.0)),  # entirely off-origin
])
def test_point_radius_pairs_matches_bruteforce(seed, box):
    """The salted-cell self-join emits exactly the brute-force pair set
    (including eps-boundary distances and negative-cell floors)."""
    from pyrosar_ray.stages.spatial import point_radius_pairs

    rng = np.random.default_rng(seed)
    n = 120
    x0, x1, y0, y1 = box
    df = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64) * 3 + 1,
            "lon": np.round(rng.uniform(x0, x1, n), 2),
            "lat": np.round(rng.uniform(y0, y1, n), 2),
        }
    )
    got = (
        point_radius_pairs(rd.from_pandas(df).repartition(4), radius_cd=100)
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    xy = np.stack(
        [np.rint(df.lon.to_numpy() * 100), np.rint(df.lat.to_numpy() * 100)]
    ).T.astype(np.int64)
    ids = df.point_id.to_numpy()
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    ia, ib = np.nonzero((d2 <= 100 * 100) & (ids[:, None] < ids[None, :]))
    want = pd.DataFrame(
        {"id_a": ids[ia], "id_b": ids[ib], "dist2_u": d2[ia, ib]}
    ).sort_values(["id_a", "id_b"], ignore_index=True)
    assert len(got) == len(want) > 0
    assert got.equals(want)
