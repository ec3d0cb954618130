"""Property tests for the H3-style aperture-7 hex grid."""

import numpy as np
import pytest

from pyrosar_ray.functions.hexgrid import (
    axial_to_cell,
    cell_axial,
    cell_boundary,
    cell_center,
    cell_children,
    cell_parent,
    circumradius,
    cover_bbox_hex,
    grid_disk,
    grid_distance,
    hex_cell_of_points,
)

RNG = np.random.default_rng(7)


def _rand_points(n=4000):
    lon = RNG.uniform(-179, 179, n)
    lat = RNG.uniform(-89, 89, n)
    return lon, lat


def test_point_center_roundtrip():
    # the center of a point's cell maps back to the same cell
    lon, lat = _rand_points()
    for res in (0, 3, 7, 12):
        cells = hex_cell_of_points(lon, lat, res)
        clon, clat = cell_center(cells)
        again = hex_cell_of_points(clon, clat, res)
        assert np.array_equal(cells, again)


def test_point_within_circumradius_of_center():
    lon, lat = _rand_points()
    for res in (0, 4, 9):
        cells = hex_cell_of_points(lon, lat, res)
        clon, clat = cell_center(cells)
        d = np.hypot(lon - clon, lat - clat)
        assert d.max() <= circumradius(res) * (1 + 1e-9)


def test_axial_id_roundtrip_negative_coords():
    q = np.array([-5, 0, 7, -(1 << 25), (1 << 25)], dtype=np.int64)
    r = np.array([3, -9, 0, (1 << 25), -(1 << 25)], dtype=np.int64)
    cells = axial_to_cell(q, r, 6)
    res, q2, r2 = cell_axial(cells)
    assert np.all(res == 6)
    assert np.array_equal(q, q2)
    assert np.array_equal(r, r2)


def test_parent_contains_child_center():
    lon, lat = _rand_points(2000)
    for res in (1, 5, 10):
        cells = hex_cell_of_points(lon, lat, res)
        parents = cell_parent(cells)
        # parent looked up directly from the child's center agrees
        clon, clat = cell_center(cells)
        direct = hex_cell_of_points(clon, clat, res - 1)
        assert np.array_equal(parents, direct)


def test_children_partition_exactly_seven():
    lon, lat = _rand_points(300)
    cells = np.unique(hex_cell_of_points(lon, lat, 4))
    for c in cells[:50]:
        kids = cell_children(int(c))
        assert len(kids) == 7
        assert np.all(cell_parent(kids) == c)


def test_children_of_disk_tile_plane():
    # children of a disk of parents tile with no overlap (partition)
    base = hex_cell_of_points(np.array([10.0]), np.array([20.0]), 3)
    _, disk = grid_disk(base, 2)
    all_kids = np.concatenate([cell_children(int(c)) for c in disk])
    assert len(np.unique(all_kids)) == len(all_kids) == 7 * len(disk)


def test_grid_disk_size_and_distance():
    cell = hex_cell_of_points(np.array([5.0]), np.array([-30.0]), 5)
    for k in (0, 1, 2, 4):
        row_idx, disk = grid_disk(cell, k)
        assert len(disk) == 1 + 3 * k * (k + 1)
        assert np.all(row_idx == 0)
        dist = grid_distance(disk, np.repeat(cell, len(disk)))
        assert dist.max() == (k if k else 0)


def test_boundary_hexagon_geometry():
    cell = int(hex_cell_of_points(np.array([33.0]), np.array([11.0]), 6)[0])
    verts = cell_boundary(cell)
    assert verts.shape == (6, 2)
    clon, clat = cell_center(np.array([cell]))
    d = np.hypot(verts[:, 0] - clon[0], verts[:, 1] - clat[0])
    # all six vertices on the circumcircle
    assert np.allclose(d, circumradius(6), rtol=1e-9)


def test_cover_superset_bruteforce():
    # every cell whose sampled interior points land in the bbox is covered
    rng = np.random.default_rng(11)
    for res in (2, 5):
        xmin = rng.uniform(-170, 160, 40)
        ymin = rng.uniform(-80, 70, 40)
        xmax = xmin + rng.uniform(0.01, 8.0, 40)
        ymax = ymin + rng.uniform(0.01, 8.0, 40)
        row_idx, cells = cover_bbox_hex(xmin, ymin, xmax, ymax, res)
        covered = {}
        for i, c in zip(row_idx, cells):
            covered.setdefault(int(i), set()).add(int(c))
        # sample points inside each bbox; their cells must be in the cover
        for i in range(40):
            px = rng.uniform(xmin[i], xmax[i], 200)
            py = rng.uniform(ymin[i], ymax[i], 200)
            pc = set(hex_cell_of_points(px, py, res).tolist())
            assert pc <= covered[i], f"bbox {i} missing cells at res {res}"


def test_cover_not_wildly_loose():
    # cover size stays within a small constant of the touched-cell count
    rng = np.random.default_rng(3)
    xmin = rng.uniform(-170, 160, 30)
    ymin = rng.uniform(-80, 70, 30)
    xmax = xmin + rng.uniform(0.5, 6.0, 30)
    ymax = ymin + rng.uniform(0.5, 6.0, 30)
    res = 4
    row_idx, cells = cover_bbox_hex(xmin, ymin, xmax, ymax, res)
    for i in range(30):
        n_cover = int(np.sum(row_idx == i))
        px = rng.uniform(xmin[i], xmax[i], 4000)
        py = rng.uniform(ymin[i], ymax[i], 4000)
        n_touched = len(np.unique(hex_cell_of_points(px, py, res)))
        assert n_cover <= 4 * n_touched + 16


def test_res_bounds():
    with pytest.raises(ValueError):
        hex_cell_of_points(np.array([0.0]), np.array([0.0]), 13)
    with pytest.raises(ValueError):
        cell_parent(hex_cell_of_points(np.array([0.0]), np.array([0.0]), 0))


def test_spatial_join_grid_hook():
    from pyrosar_ray.stages.spatial import _grid_fns

    pf, cf = _grid_fns("hex")
    cells = pf(np.array([1.0, 2.0]), np.array([3.0, 4.0]), 2)
    assert cells.dtype == np.int64 and len(cells) == 2
    ri, cc = cf(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0]), 2)
    assert len(ri) == len(cc) > 0
