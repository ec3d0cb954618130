"""Quad footprints: convexity, PIP kernel, polyfill pruning."""

import numpy as np
import pyarrow as pa

from pyrosar_ray.derive import quad_corners_from_keys
from pyrosar_ray.functions.geometry import boxes_intersect_quads


def _quads(keys):
    q = quad_corners_from_keys(np.asarray(keys, dtype=np.int64))
    qx = np.stack([q["qax"], q["qbx"], q["qcx"], q["qdx"]], axis=1)
    qy = np.stack([q["qay"], q["qby"], q["qcy"], q["qdy"]], axis=1)
    return qx, qy


def test_quads_convex_ccw_for_all_keys():
    keys = np.arange(1, 20000)
    qx, qy = _quads(keys)
    bx = np.roll(qx, -1, axis=1)
    by = np.roll(qy, -1, axis=1)
    # cross of consecutive edge vectors >= 0 at every vertex -> convex CCW
    ex, ey = bx - qx, by - qy
    nx, ny = np.roll(ex, -1, axis=1), np.roll(ey, -1, axis=1)
    cross = ex * ny - ey * nx
    assert (cross >= 0).all()
    # and non-degenerate: positive area
    area2 = (qx * np.roll(qy, -1, axis=1) - np.roll(qx, -1, axis=1) * qy).sum(axis=1)
    assert (area2 > 0).all()


def test_quad_inside_bbox():
    keys = np.arange(1, 5000)
    q = quad_corners_from_keys(keys)
    k = np.where(keys % 10 == 9, keys - 1, keys)
    xmin = (k * 9973 % 33000) / 100.0 - 170.0
    ymin = (k * 7919 % 13000) / 100.0 - 70.0
    xmax = xmin + (100 + k % 7 * 50) / 100.0
    ymax = ymin + (100 + k % 5 * 50) / 100.0
    for cx, cy in (("qax", "qay"), ("qbx", "qby"), ("qcx", "qcy"), ("qdx", "qdy")):
        assert (q[cx] >= xmin - 1e-12).all() and (q[cx] <= xmax + 1e-12).all()
        assert (q[cy] >= ymin - 1e-12).all() and (q[cy] <= ymax + 1e-12).all()


def test_pip_mask_matches_scalar_reference():
    from pyrosar_ray.stages.spatial import SceneCellIndex

    rng = np.random.default_rng(5)
    keys = np.arange(1, 200)
    q = quad_corners_from_keys(keys)
    qx, qy = _quads(keys)
    idx = {
        "res": 0,
        "grid": "flat",
        "scene_idx_sorted": np.zeros(0, dtype=np.int64),
        "unique_cells": np.zeros(0, dtype=np.int64),
        "offsets": np.zeros(1, dtype=np.int64),
        "sxmin": qx.min(axis=1),
        "symin": qy.min(axis=1),
        "sxmax": qx.max(axis=1),
        "symax": qy.max(axis=1),
        "emit": pa.table({"scene_key": pa.array(keys)}),
        **{c: q[c] for c in ("qax", "qay", "qbx", "qby", "qcx", "qcy", "qdx", "qdy")},
    }
    import ray

    ref = ray.put(idx)
    probe = SceneCellIndex(ref, ("scene_key",), ("point_id", "lon", "lat"), "quad")
    scene_idx = rng.integers(0, len(keys), 3000)
    pl = rng.uniform(-170, -130, 3000)
    pt = rng.uniform(-70, 60, 3000)
    got = probe._quad_mask(scene_idx, pl, pt)
    for i in rng.choice(3000, 400, replace=False):
        s = scene_idx[i]
        ok = True
        for e in range(4):
            ax, ay = qx[s, e], qy[s, e]
            bx, by = qx[s, (e + 1) % 4], qy[s, (e + 1) % 4]
            if (bx - ax) * (pt[i] - ay) - (by - ay) * (pl[i] - ax) < 0:
                ok = False
                break
        assert got[i] == ok


def test_boxes_intersect_quads_vs_sampling():
    rng = np.random.default_rng(9)
    qx, qy = _quads(np.arange(1, 400))
    n = len(qx)
    cx = qx.mean(axis=1) + rng.uniform(-1.5, 1.5, n)
    cy = qy.mean(axis=1) + rng.uniform(-1.5, 1.5, n)
    half = rng.uniform(0.05, 0.8, n)
    got = boxes_intersect_quads(qx, qy, cx - half, cy - half, cx + half, cy + half)
    # sampled points inside the box that land in the quad => must intersect
    for i in range(n):
        px = rng.uniform(cx[i] - half[i], cx[i] + half[i], 300)
        py = rng.uniform(cy[i] - half[i], cy[i] + half[i], 300)
        inside = np.ones(300, dtype=bool)
        for e in range(4):
            ax, ay = qx[i, e], qy[i, e]
            bx, by = qx[i, (e + 1) % 4], qy[i, (e + 1) % 4]
            inside &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
        if inside.any():
            assert got[i], f"box {i} contains quad points but SAT says miss"


def test_polyfill_prunes_but_never_undercover():
    """quad=True index: fewer cells than the bbox cover, and every
    point-in-quad still lands in an indexed cell."""
    from pyrosar_ray.functions.cells import cell_of_points
    from pyrosar_ray.stages.spatial import build_scene_index

    keys = np.arange(1, 800)
    q = quad_corners_from_keys(keys)
    qx, qy = _quads(keys)
    tab = pa.table(
        {
            "scene_key": pa.array(keys),
            "xmin": pa.array(qx.min(axis=1)),
            "ymin": pa.array(qy.min(axis=1)),
            "xmax": pa.array(qx.max(axis=1)),
            "ymax": pa.array(qy.max(axis=1)),
            **{c: pa.array(q[c]) for c in q},
        }
    )
    res = 2
    plain = build_scene_index(tab, res, ("scene_key",), grid="flat")
    filled = build_scene_index(tab, res, ("scene_key",), grid="flat", quad=True)
    n_plain = len(plain["scene_idx_sorted"])
    n_fill = len(filled["scene_idx_sorted"])
    assert n_fill <= n_plain
    # sample interior points of each quad; their cell must be indexed for
    # that scene in the polyfilled index
    per_scene = {}
    for pos, s in enumerate(filled["scene_idx_sorted"]):
        per_scene.setdefault(int(s), set())
    starts = filled["offsets"]
    cells = filled["unique_cells"]
    for ci in range(len(cells)):
        for e in range(int(starts[ci]), int(starts[ci + 1])):
            per_scene.setdefault(int(filled["scene_idx_sorted"][e]), set()).add(
                int(cells[ci])
            )
    rng = np.random.default_rng(1)
    for s in rng.choice(len(keys), 150, replace=False):
        # rejection-sample points inside the quad
        px = rng.uniform(qx[s].min(), qx[s].max(), 500)
        py = rng.uniform(qy[s].min(), qy[s].max(), 500)
        inside = np.ones(500, dtype=bool)
        for e in range(4):
            ax, ay = qx[s, e], qy[s, e]
            bx, by = qx[s, (e + 1) % 4], qy[s, (e + 1) % 4]
            inside &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
        pc = set(cell_of_points(px[inside], py[inside], res).tolist())
        assert pc <= per_scene.get(int(s), set())
