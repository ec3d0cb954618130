"""Distance-threshold spatial join (stages/spatial.spatial_radius_join)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pyrosar_ray.stages.spatial import spatial_radius_join


def _scenes(cx_md: list[int], cy_md: list[int]) -> ray.data.Dataset:
    # bbox whose midpoint lands exactly on the requested milli-degree
    cx = np.array(cx_md, dtype=np.float64) / 1000.0
    cy = np.array(cy_md, dtype=np.float64) / 1000.0
    return ray.data.from_arrow(
        pa.table(
            {
                "scene_key": pa.array(np.arange(1, len(cx) + 1, dtype=np.int64)),
                "xmin": pa.array(cx - 0.5),
                "xmax": pa.array(cx + 0.5),
                "ymin": pa.array(cy - 0.25),
                "ymax": pa.array(cy + 0.25),
            }
        )
    )


def _points(lon_md: list[int], lat_md: list[int]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "point_id": pa.array(
                    np.arange(101, 101 + len(lon_md), dtype=np.int64)
                ),
                "lon": pa.array(np.array(lon_md, dtype=np.float64) / 1000.0),
                "lat": pa.array(np.array(lat_md, dtype=np.float64) / 1000.0),
            }
        )
    )


def test_matches_bruteforce_with_exact_boundary():
    rng = np.random.default_rng(3)
    s_cx = rng.integers(-20000, 20000, 40).tolist()
    s_cy = rng.integers(-10000, 10000, 40).tolist()
    p_lon = rng.integers(-20000, 20000, 120).tolist()
    p_lat = rng.integers(-10000, 10000, 120).tolist()
    # plant one pair at EXACTLY the radius (900² + 1200² = 1500²)
    s_cx.append(5000), s_cy.append(5000)
    p_lon.append(5900), p_lat.append(6200)
    # and one just outside
    s_cx.append(-5000), s_cy.append(-5000)
    p_lon.append(-5900), p_lat.append(-6201)

    out = (
        spatial_radius_join(
            _scenes(s_cx, s_cy), _points(p_lon, p_lat), radius_md=1500
        )
        .to_pandas()
        .sort_values(["point_id", "scene_key"])
        .reset_index(drop=True)
    )

    rows = []
    for si, (sx, sy) in enumerate(zip(s_cx, s_cy), start=1):
        for pi, (px, py) in enumerate(zip(p_lon, p_lat), start=101):
            d2 = (sx - px) ** 2 + (sy - py) ** 2
            if d2 <= 1500 * 1500:
                rows.append((pi, si, d2))
    want = (
        pd.DataFrame(rows, columns=["point_id", "scene_key", "dist2_u"])
        .sort_values(["point_id", "scene_key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype("int64"), want.astype("int64"))
    # the planted boundary pair is included (<=), the outside one is not
    assert ((out["dist2_u"] == 1500 * 1500).sum()) >= 1


def test_exactly_once_across_cell_boundaries():
    # scene centroid ON a cell boundary, point in the neighbor cell:
    # 9-fold replication must still emit the pair exactly once
    out = spatial_radius_join(
        _scenes([4000], [0]),
        _points([3999, 4000, 4001], [0, 0, 0]),
        radius_md=1500,
    ).to_pandas()
    assert len(out) == 3
    assert out["scene_key"].tolist() == [1, 1, 1]
    assert sorted(out["dist2_u"]) == [0, 1, 1]


def test_cell_smaller_than_radius_rejected():
    import pytest

    with pytest.raises(ValueError):
        spatial_radius_join(
            _scenes([0], [0]), _points([0], [0]), radius_md=5000, cell_md=4000
        )


def test_cell_size_invariance():
    # the physical partitioning knob must not change the answer: any
    # cell_md >= radius_md yields the identical pair set (finer cells =
    # the documented hot-cell mitigation, coarser = fewer groups)
    rng = np.random.default_rng(9)
    s_cx = rng.integers(-9000, 9000, 25).tolist()
    s_cy = rng.integers(-9000, 9000, 25).tolist()
    p_lon = rng.integers(-9000, 9000, 80).tolist()
    p_lat = rng.integers(-9000, 9000, 80).tolist()
    outs = []
    for cell_md in (1500, 2500, 4000):
        out = (
            spatial_radius_join(
                _scenes(s_cx, s_cy),
                _points(p_lon, p_lat),
                radius_md=1500,
                cell_md=cell_md,
            )
            .to_pandas()
            .sort_values(["point_id", "scene_key"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_grid_focal_sum_wrap_and_surface():
    from pyrosar_ray.stages.spatial import grid_focal_sum

    # three points: two in one cell at the antimeridian's west edge, one
    # across the wrap; plus an isolated point far away
    pts = ray.data.from_arrow(
        pa.table(
            {
                "point_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "lon": pa.array([-179.5, -179.2, 179.5, 10.5]),
                "lat": pa.array([0.5, 0.5, 0.5, 20.5]),
            }
        )
    )
    out = (
        grid_focal_sum(pts)
        .to_pandas()
        .set_index(["cell_lon", "cell_lat"])
        .sort_index()
    )
    # own counts survive
    assert out.loc[(-180, 0), "n"] == 2
    assert out.loc[(179, 0), "n"] == 1
    assert out.loc[(10, 20), "n"] == 1
    # focal sums see across the antimeridian in BOTH directions
    assert out.loc[(-180, 0), "focal_sum"] == 3
    assert out.loc[(179, 0), "focal_sum"] == 3
    # empty neighbors appear on the surface with n=0
    assert out.loc[(11, 21), "n"] == 0
    assert out.loc[(11, 21), "focal_sum"] == 1
    # isolated point's 3x3 patch: 9 cells, all focal_sum 1
    patch = out.loc[(slice(9, 11), slice(19, 21)), :]
    assert len(patch) == 9 and (patch["focal_sum"] == 1).all()


def test_tile_areal_transfer_conservation():
    from pyrosar_ray.stages.tiling import tile_areal_transfer

    scenes = ray.data.from_arrow(
        pa.table(
            {
                "scene_key": pa.array([1, 2], type=pa.int64()),
                # scene 1 spans 4 tiles equally (2x2 degrees from -0.5)
                "xmin": pa.array([-0.5, 10.25]),
                "xmax": pa.array([1.5, 10.75]),
                "ymin": pa.array([-0.5, 20.25]),
                "ymax": pa.array([1.5, 20.75]),
                "attr_c": pa.array([1000, 777], type=pa.int64()),
            }
        )
    )
    out = tile_areal_transfer(scenes).to_pandas()
    # scene 1 (2°×2° anchored at -0.5) spans 3×3 tiles: 4 corners of
    # 1/16 area (floor 62), 4 edges of 1/8 (125), 1 center of 1/4 (250);
    # scene 2 sits whole inside one tile (777)
    assert sorted(out["transferred_u"]) == [62, 62, 62, 62, 125, 125, 125, 125, 250, 777]
    # conservation: total transferred within per-scene floor loss
    assert out["transferred_u"].sum() <= 1000 + 777
    assert out["transferred_u"].sum() >= 1000 + 777 - 9 - 1
