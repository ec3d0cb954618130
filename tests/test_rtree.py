"""STR R-tree (functions/rtree.py) + the R-tree kNN plan (stages/knn.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.functions.rtree import STRtree


def _brute_pairs(rects, qx0, qy0, qx1, qy1):
    xmin, ymin, xmax, ymax = rects
    out = []
    for q in range(len(qx0)):
        hit = (
            (qx0[q] <= xmax) & (qx1[q] >= xmin) & (qy0[q] <= ymax) & (qy1[q] >= ymin)
        )
        out.extend((q, e) for e in np.flatnonzero(hit))
    return sorted(out)


@pytest.mark.parametrize("n,fanout", [(0, 16), (1, 16), (7, 4), (500, 16), (2000, 8)])
def test_query_boxes_matches_brute_force(n, fanout):
    rng = np.random.default_rng(n + fanout)
    xmin = rng.uniform(-100, 100, n)
    ymin = rng.uniform(-80, 80, n)
    rects = (xmin, ymin, xmin + rng.uniform(0, 5, n), ymin + rng.uniform(0, 5, n))
    tree = STRtree(*rects, fanout=fanout)
    qx0 = rng.uniform(-110, 100, 50)
    qy0 = rng.uniform(-90, 80, 50)
    qx1 = qx0 + rng.uniform(0, 20, 50)
    qy1 = qy0 + rng.uniform(0, 20, 50)
    qi, ei = tree.query_boxes(qx0, qy0, qx1, qy1)
    got = sorted(zip(qi.tolist(), ei.tolist()))
    assert got == _brute_pairs(rects, qx0, qy0, qx1, qy1)


def test_query_points_as_degenerate_rects():
    rng = np.random.default_rng(9)
    px = rng.uniform(0, 10, 300)
    py = rng.uniform(0, 10, 300)
    tree = STRtree(px, py, px, py)
    qi, ei = tree.query_boxes(
        np.array([2.0]), np.array([3.0]), np.array([5.0]), np.array([7.0])
    )
    want = np.flatnonzero((px >= 2) & (px <= 5) & (py >= 3) & (py <= 7))
    assert sorted(ei.tolist()) == sorted(want.tolist())
    assert (qi == 0).all()


def test_empty_queries_and_empty_tree():
    tree = STRtree(*(np.zeros(0),) * 4)
    qi, ei = tree.query_boxes(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0]))
    assert len(qi) == 0 and len(ei) == 0
    tree2 = STRtree(np.array([1.0]), np.array([1.0]), np.array([2.0]), np.array([2.0]))
    qi, ei = tree2.query_boxes(np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0))
    assert len(qi) == 0


def test_knn_plans_agree(sf_dir):
    """R-tree radius-doubling kNN emits the exact expanding-ring rows."""
    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.knn import spatial_knn

    scenes = load_scenes(sf_dir)
    points = load_points(sf_dir).limit(400)

    def rows(strategy):
        out = spatial_knn(scenes, points, k=5, strategy=strategy).to_pandas()
        return out.sort_values(["point_id", "rank"], ignore_index=True)

    pd.testing.assert_frame_equal(rows("cells"), rows("rtree"))


def test_knn_rtree_sparse_catalog_emits_partial_lists(sf_dir):
    """Catalog smaller than k: every probe gets all scenes, ranked."""
    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.knn import spatial_knn

    scenes = load_scenes(sf_dir).limit(3)
    points = load_points(sf_dir).limit(50)
    out = spatial_knn(scenes, points, k=5, strategy="rtree").to_pandas()
    per_probe = out.groupby("point_id")["rank"].agg(["count", "max"])
    assert (per_probe["count"] == 3).all()
    assert (per_probe["max"] == 3).all()


def test_unknown_strategy_rejected():
    from pyrosar_ray.stages.knn import spatial_knn

    with pytest.raises(ValueError):
        spatial_knn(
            ray.data.from_items([{"scene_key": 1, "xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}]),
            ray.data.from_items([{"point_id": 1, "lon": 0.5, "lat": 0.5}]),
            strategy="kd",
        )


def test_hex_knn_matches_cells_plan(sf_dir):
    import ray

    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.knn import spatial_knn

    pts = load_points(sf_dir).limit(400)
    a = (
        spatial_knn(load_scenes(sf_dir), pts, k=5, strategy="cells")
        .to_pandas()
        .sort_values(["point_id", "rank"], ignore_index=True)
    )
    b = (
        spatial_knn(load_scenes(sf_dir), pts, k=5, strategy="hex", res=1)
        .to_pandas()
        .sort_values(["point_id", "rank"], ignore_index=True)
    )
    assert a.equals(b)


@pytest.mark.parametrize("replicate", ["scenes", "points"])
def test_partitioned_knn_matches_broadcast_with_sparse_tail(sf_dir, replicate):
    """halo=1 at a coarse res leaves sparse probes unresolved; the
    broadcast fallback must stitch them to the exact broadcast rows —
    in both replication modes (scene copies to halo cells vs probe
    copies + partial-top-k merge)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.knn import partitioned_spatial_knn, spatial_knn

    rng = np.random.default_rng(3)
    # sparse clustered catalog: most of the plane is empty
    n = 120
    cx = np.concatenate([rng.uniform(0, 4, n // 2), rng.uniform(60, 61, n // 2)])
    cy = np.concatenate([rng.uniform(0, 4, n // 2), rng.uniform(10, 11, n // 2)])
    scenes = ray.data.from_arrow(
        pa.table(
            {
                "scene_key": pa.array(np.arange(n, dtype=np.int64)),
                "xmin": pa.array(cx - 0.1),
                "ymin": pa.array(cy - 0.1),
                "xmax": pa.array(cx + 0.1),
                "ymax": pa.array(cy + 0.1),
            }
        )
    )
    m = 150
    points = ray.data.from_arrow(
        pa.table(
            {
                "point_id": pa.array(np.arange(m, dtype=np.int64)),
                "lon": pa.array(rng.uniform(-30, 70, m)),
                "lat": pa.array(rng.uniform(-20, 30, m)),
            }
        )
    )
    a = (
        spatial_knn(scenes, points, k=5, strategy="cells")
        .to_pandas()
        .sort_values(["point_id", "rank"], ignore_index=True)
    )
    b = (
        partitioned_spatial_knn(
            scenes, points, k=5, halo=1, num_partitions=8, replicate=replicate
        )
        .to_pandas()
        .sort_values(["point_id", "rank"], ignore_index=True)
    )
    assert len(a) == m * 5
    assert a.equals(b)
