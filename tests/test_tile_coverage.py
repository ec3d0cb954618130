"""Per-tile exact covered area (stages/tiling.py tile_coverage)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.tiling import tile_coverage


def _scenes(boxes):
    xmin, ymin, xmax, ymax = map(np.asarray, zip(*boxes))
    return ray.data.from_arrow(
        pa.table(
            {
                "xmin": pa.array(xmin, pa.float64()),
                "ymin": pa.array(ymin, pa.float64()),
                "xmax": pa.array(xmax, pa.float64()),
                "ymax": pa.array(ymax, pa.float64()),
            }
        )
    ).repartition(3)


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_tile_coverage_exact_areas(combine):
    # one box inside a tile, one spanning 2x2 tiles, one shared tile
    out = (
        tile_coverage(
            _scenes(
                [
                    (10.25, 20.25, 10.75, 20.75),  # 0.5x0.5 inside N20E010
                    (10.50, 20.50, 11.50, 21.50),  # 2x2 span, 0.5x0.5 corners
                ]
            ),
            combine=combine,
        )
        .to_pandas()
        .sort_values("tile", ignore_index=True)
    )
    got = dict(zip(out["tile"], out["covered_cdeg2"]))
    # N20E010: 50x50 + 50x50 = 5000; the three other corners 2500 each
    assert got == {
        "N20E010": 5000,
        "N20E011": 2500,
        "N21E010": 2500,
        "N21E011": 2500,
    }
    n = dict(zip(out["tile"], out["n_scenes"]))
    assert n == {"N20E010": 2, "N20E011": 1, "N21E010": 1, "N21E011": 1}
    cov = dict(zip(out["tile"], out["coverage"]))
    assert cov["N20E010"] == 0.5 and cov["N21E011"] == 0.25


def test_tile_coverage_boundary_sliver_is_zero_area():
    # xmax exactly on a tile edge: the edge tile appears (expansion
    # parity with assign_tiles/getHGT) with zero covered area
    out = tile_coverage(_scenes([(10.0, 20.0, 11.0, 20.5)])).to_pandas()
    got = dict(zip(out["tile"], out["covered_cdeg2"]))
    assert got["N20E010"] == 100 * 50
    assert got.get("N20E011", 0) == 0
