"""S2 cube-face Hilbert grid (functions/s2cells.py): public-layout and
hierarchy invariants, plus the spatial-join grid swap."""

import numpy as np
import pytest

from pyrosar_ray.functions import s2cells as s2


def _rand_points(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_level0_ids_match_public_layout():
    """Level-0 cell of face f is f<<61 | 1<<60 (the public FromFace id)."""
    lon = np.array([0.0, 90.0, 45.0, 180.0, -90.0, 10.0])
    lat = np.array([0.0, 0.0, 80.0, 0.0, -10.0, -85.0])
    ids = s2.s2_cell_of_points(lon, lat, 0).view(np.uint64)
    want = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | (
        np.uint64(1) << np.uint64(60)
    )
    assert (ids == want).all()
    assert s2.cell_token(ids.view(np.int64)) == ["1", "3", "5", "7", "9", "b"]


def test_face_uv_roundtrip():
    lon, lat = _rand_points(2000, 1)
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert face.min() >= 0 and face.max() <= 5
    assert np.abs(u).max() <= 1 + 1e-12 and np.abs(v).max() <= 1 + 1e-12
    x2, y2, z2 = s2.face_uv_to_xyz(face, u, v)
    np.testing.assert_allclose(np.c_[x, y, z], np.c_[x2, y2, z2], atol=1e-12)


def test_st_uv_roundtrip_and_monotonic():
    s = np.linspace(0, 1, 1001)
    np.testing.assert_allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)
    u = s2.st_to_uv(s)
    assert (np.diff(u) > 0).all()
    assert u[0] == -1 and u[-1] == 1 and u[500] == 0


@pytest.mark.parametrize("level", [1, 5, 12, 30])
def test_parent_containment(level):
    lon, lat = _rand_points()
    child = s2.s2_cell_of_points(lon, lat, level)
    parent = s2.s2_cell_of_points(lon, lat, level - 1)
    assert (s2.cell_parent(child, level - 1) == parent).all()


@pytest.mark.parametrize("level", [3, 9, 17])
def test_fij_roundtrip_and_level(level):
    lon, lat = _rand_points()
    c = s2.s2_cell_of_points(lon, lat, level)
    f, i, j = s2.cell_to_fij(c, level)
    assert (s2.fij_to_cell(f, i, j, level) == c).all()
    assert (s2.cell_level(c) == level).all()


@pytest.mark.parametrize("level", [2, 4, 7])
def test_hilbert_curve_is_continuous(level):
    """Consecutive curve positions are edge-adjacent cells on every face
    — pins the orientation lookup tables."""
    n = 1 << (2 * level)
    pos = np.arange(n - 1, dtype=np.uint64)
    for face in range(6):
        fc = np.full(n - 1, face, dtype=np.int64)
        i0, j0 = s2.hilbert_ij(fc, pos, level)
        i1, j1 = s2.hilbert_ij(fc, pos + np.uint64(1), level)
        assert (np.abs(i1 - i0) + np.abs(j1 - j0) == 1).all()


def test_hilbert_positions_are_a_permutation():
    level = 5
    n = 1 << level
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for face in (0, 1):
        fc = np.full(n * n, face, dtype=np.int64)
        pos = s2.hilbert_pos(fc, ii.ravel(), jj.ravel(), level)
        assert len(np.unique(pos)) == n * n


@pytest.mark.parametrize(
    "bbox", [(12, 40, 19, 47), (-180, 85, 180, 90), (176, -10, 180, -3), (-1, -1, 1, 1)]
)
def test_cover_is_superset_of_point_cells(bbox):
    xmin, ymin, xmax, ymax = bbox
    level = 6
    _, cov = s2.cover_bbox_s2(
        np.array([float(xmin)]),
        np.array([float(ymin)]),
        np.array([float(xmax)]),
        np.array([float(ymax)]),
        level,
    )
    rng = np.random.default_rng(3)
    qlon = rng.uniform(xmin, xmax, 4000)
    qlat = rng.uniform(ymin, ymax, 4000)
    assert np.isin(s2.s2_cell_of_points(qlon, qlat, level), cov).all()


def test_cover_empty_input():
    z = np.zeros(0)
    row, cov = s2.cover_bbox_s2(z, z, z, z, 5)
    assert len(row) == 0 and len(cov) == 0


def test_cover_world_at_level0_is_six_faces():
    row, cov = s2.cover_bbox_s2(
        np.array([-180.0]), np.array([-90.0]), np.array([180.0]), np.array([90.0]), 0
    )
    assert len(cov) == 6 and len(np.unique(cov)) == 6


def test_spatial_join_grid_swap_same_pairs(sf_dir):
    """Broadcast join over the S2 grid emits the exact flat-grid pair set."""
    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.spatial import spatial_join_points

    def pairs(**kw):
        out = spatial_join_points(load_scenes(sf_dir), load_points(sf_dir), **kw)
        df = out.select_columns(["scene_key", "point_id"]).to_pandas()
        return df.sort_values(["scene_key", "point_id"], ignore_index=True)

    flat = pairs()
    via_s2 = pairs(grid="s2", res=7)
    import pandas as pd

    pd.testing.assert_frame_equal(flat, via_s2)


def test_unknown_grid_rejected():
    from pyrosar_ray.stages.spatial import _grid_fns

    with pytest.raises(ValueError):
        _grid_fns("h4")


def test_partitioned_join_over_s2_grid(sf_dir):
    """Co-partition plan on S2 cells emits the flat-grid pair set."""
    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.spatial import spatial_join_points

    def pairs(**kw):
        out = spatial_join_points(
            load_scenes(sf_dir), load_points(sf_dir).limit(2000), **kw
        )
        df = out.select_columns(["scene_key", "point_id"]).to_pandas()
        return df.sort_values(["scene_key", "point_id"], ignore_index=True)

    flat = pairs()
    s2p = pairs(strategy="partitioned", grid="s2", res=7, num_partitions=8)
    import pandas as pd

    pd.testing.assert_frame_equal(flat, s2p)
