"""Raster → vector footprint extraction goldens (stages/footprint.py).

Reference surface: GDAL polygonize + linesimplify border reduction
(reference linesimplify.py, snap/util.py border handling), re-expressed
as mask-span extraction + VW ring reduction.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyrosar_ray.stages.footprint import _spans_for


def test_spans_closed_form():
    arr = np.zeros((4, 8), dtype=np.uint8)
    arr[1, 2:6] = 9
    arr[2, 0:8] = 9
    ys, x0, x1 = _spans_for(arr)
    assert ys.tolist() == [1, 2]
    assert x0.tolist() == [2, 0]
    assert x1.tolist() == [5, 7]


def test_spans_empty_mask():
    ys, x0, x1 = _spans_for(np.zeros((3, 3), dtype=np.uint8))
    assert len(ys) == 0


def test_synth_contract_matches_pixels():
    from pyrosar_ray.sources.images import FOOT_H, FOOT_W, synth_footprint_raster

    for i in (0, 1, 5, 7, 11, 23):
        arr = np.frombuffer(synth_footprint_raster(i), dtype=np.uint8).reshape(
            FOOT_H, FOOT_W
        )
        ys, x0, x1 = _spans_for(arr)
        assert ys.tolist() == list(range(FOOT_H))
        a, b = i % 4, i % 3
        c, d = (i // 2) % 3, (i // 3) % 2
        for y in (0, 10, FOOT_H - 1):
            assert x0[y] == a + (b * y) // 4
            assert x1[y] == FOOT_W - 1 - c - (d * y) // 4


def test_footprint_polygon_ring_and_area(ray_session):
    from pyrosar_ray.stages.footprint import footprint_polygons

    arr = np.zeros((6, 10), dtype=np.uint8)
    arr[1:5, 2:7] = 50  # 4 rows × 5 cols valid
    ds = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["r1"], type=pa.string()),
                "bytes": pa.array([arr.tobytes()], type=pa.binary()),
                "w": pa.array([10], type=pa.int32()),
                "h": pa.array([6], type=pa.int32()),
            }
        )
    )
    out = footprint_polygons(ds, max_points=6).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["ring_points"] == 8  # 4 right + 4 left vertices
    assert row["simplified_points"] == 6
    # ring spans x in [2, 7] (right edges at x1+1), y in [1, 4] → 5×3
    assert row["area"] == 15.0
    assert row["wkt"].startswith("POLYGON ((")


def test_footprint_query_slice(ray_session):
    import __ray_entry__ as e

    out = e.queries()["raster_footprint"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500 * 24
    one = out[out["image_id"] == "fp-000000000007"].sort_values("y")
    a, b, c, d = 7 % 4, 7 % 3, (7 // 2) % 3, (7 // 3) % 2
    ys = np.arange(24)
    assert one["x_min"].tolist() == (a + (b * ys) // 4).tolist()
    assert one["x_max"].tolist() == (31 - c - (d * ys) // 4).tolist()


def test_rasterize_quads_center_semantics(sf_dir):
    """Burned cells are exactly those whose center lies in the quad."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pyrosar_ray.derive import quad_corners_from_keys
    from pyrosar_ray.stages.footprint import rasterize_quads

    keys = np.arange(1, 60, dtype=np.int64)
    q = quad_corners_from_keys(keys)
    k = np.where(keys % 10 == 9, keys - 1, keys)
    xmin = (k * 9973 % 33000) / 100.0 - 170.0
    ymin = (k * 7919 % 13000) / 100.0 - 70.0
    xmax = xmin + (100 + k % 7 * 50) / 100.0
    ymax = ymin + (100 + k % 5 * 50) / 100.0
    tab = pa.table(
        {
            "scene_key": pa.array(keys),
            "xmin": pa.array(xmin),
            "ymin": pa.array(ymin),
            "xmax": pa.array(xmax),
            "ymax": pa.array(ymax),
            **{c: pa.array(v) for c, v in q.items()},
        }
    )
    res = 3
    out = rasterize_quads(ray.data.from_arrow(tab), res=res).to_pandas()
    scale = float(1 << res)
    # scalar re-check of every burned cell + spot-check of non-burned
    burned = set(map(tuple, out[["scene_key", "row", "col"]].to_numpy()))
    qx = np.stack([q["qax"], q["qbx"], q["qcx"], q["qdx"]], axis=1)
    qy = np.stack([q["qay"], q["qby"], q["qcy"], q["qdy"]], axis=1)

    def inside(si, cx, cy):
        for e in range(4):
            ax, ay = qx[si, e], qy[si, e]
            bx, by = qx[si, (e + 1) % 4], qy[si, (e + 1) % 4]
            if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) < 0:
                return False
        return True

    for si, key in enumerate(keys):
        r0 = int(np.floor((ymin[si] + 90) * scale))
        r1 = int(np.floor((ymax[si] + 90) * scale))
        c0 = int(np.floor((xmin[si] + 180) * scale))
        c1 = int(np.floor((xmax[si] + 180) * scale))
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                cx = (c + 0.5) / scale - 180.0
                cy = (r + 0.5) / scale - 90.0
                assert ((int(key), r, c) in burned) == inside(si, cx, cy)
