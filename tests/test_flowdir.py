"""D8 flow direction (stages/images.flow_direction_counts)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from pyrosar_ray.stages.images import D8_DIRS, flow_direction_counts


def _images(arrays):
    rows = {
        "image_id": pa.array(range(len(arrays)), type=pa.int64()),
        "w": pa.array([a.shape[1] for a in arrays], type=pa.int32()),
        "h": pa.array([a.shape[0] for a in arrays], type=pa.int32()),
        "bytes": pa.array(
            [a.astype(np.uint8).tobytes() for a in arrays], type=pa.binary()
        ),
    }
    return ray.data.from_arrow(pa.table(rows))


def test_flat_raster_is_all_pits(ray_session):
    flat = np.full((6, 8), 77)
    out = flow_direction_counts(_images([flat])).to_pandas()
    assert len(out) == 1
    assert int(out.code.iloc[0]) == 0
    assert int(out.n.iloc[0]) == 4 * 6  # (h-2)*(w-2)


def test_east_ramp_flows_east(ray_session):
    # values decrease eastwards -> steepest drop is E (code 1) everywhere
    ramp = np.tile(np.arange(10, 0, -1) * 10, (6, 1))
    out = flow_direction_counts(_images([ramp])).to_pandas()
    assert list(out.code) == [1]
    assert int(out.n.iloc[0]) == 4 * 8


def test_diagonal_weight_convention(ray_session):
    """A pixel with orthogonal drop 10 and diagonal drop 13 must pick
    the ORTHOGONAL neighbor (14·10 = 140 > 10·13 = 130) — the exact
    10/14 rendering of the 1/√2 distance ratio; at diagonal drop 15 the
    diagonal wins (150 > 140)."""
    for ddrop, want in ((13, 1), (15, 2)):
        v = np.full((3, 3), 100)
        v[1, 2] = 90          # E drop 10
        v[2, 2] = 100 - ddrop  # SE drop ddrop
        out = flow_direction_counts(_images([v])).to_pandas()
        assert list(out.code) == [want], (ddrop, out)


def test_tie_breaks_on_priority_order(ray_session):
    # equal drops E and S: E comes first in D8_DIRS -> code 1
    v = np.full((3, 3), 100)
    v[1, 2] = 90
    v[2, 1] = 90
    out = flow_direction_counts(_images([v])).to_pandas()
    assert list(out.code) == [1]
    assert D8_DIRS[0][:3] == (1, 0, 1)  # the documented priority head
