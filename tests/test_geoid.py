"""Geoid → ellipsoid vertical shift (engine twin of the reference's
compound-CRS EGM application, auxdata.py:420-436 + get_egm_lookup
auxdata.py:1626-1713)."""

import numpy as np
import pytest

from pyrosar_ray.functions.geoid import GEOID_EPSG, GeoidGrid
from pyrosar_ray.functions.warp import dem_create


def planar_grid(step=1.0):
    """N(lat, lon) = 10 + lat/10 + lon/20 — bilinear interpolation of a
    planar field is EXACT, so lookups are closed-form."""
    lats = np.arange(90.0, -90.0 - step / 2, -step)
    lons = np.arange(-180.0, 180.0, step)
    grid = 10.0 + lats[:, None] / 10.0 + lons[None, :] / 20.0
    return GeoidGrid(grid, dlat=step, dlon=step)


def test_planar_lookup_exact():
    g = planar_grid()
    lats = np.array([0.0, 12.3, -45.6, 89.0])
    lons = np.array([0.0, 101.25, -179.5, 13.37])
    expect = 10.0 + lats / 10.0 + lons / 20.0
    np.testing.assert_allclose(g.undulation(lats, lons), expect, atol=1e-9)


def test_grid_node_values_are_returned_exactly():
    g = GeoidGrid.synthetic("EGM96", step=1.0)
    # at a node, bilinear weights collapse to the node value
    assert g.undulation(45.0, 7.0) == pytest.approx(g.grid[45, 187], abs=1e-12)


def test_longitude_wrap_and_pole_clamp():
    g = GeoidGrid.synthetic("EGM96", step=1.0)
    # ±180° name the same meridian
    np.testing.assert_allclose(
        g.undulation([10.0, -30.0], [180.0, 180.0]),
        g.undulation([10.0, -30.0], [-180.0, -180.0]),
        atol=1e-12,
    )
    # east of the last column interpolates toward column 0, not garbage
    v = g.undulation(0.0, 179.75)
    assert np.isfinite(v)
    # out-of-range latitudes clamp to the pole rows
    assert g.undulation(95.0, 0.0) == pytest.approx(g.undulation(90.0, 0.0))


def test_models_differ():
    g96 = GeoidGrid.synthetic("EGM96")
    g08 = GeoidGrid.synthetic("EGM2008")
    assert g96.undulation(48.0, 11.0) != pytest.approx(g08.undulation(48.0, 11.0))
    assert GEOID_EPSG == {"EGM96": 5773, "EGM2008": 3855}
    with pytest.raises(RuntimeError, match="geoid model not yet supported"):
        GeoidGrid.synthetic("EGM2020")


def test_dem_create_applies_offset_golden():
    """Identity-warp dem_create with a planar grid: output = input + N
    at each pixel center, exactly."""
    h, w = 4, 6
    arr = np.arange(h * w, dtype=np.float64).reshape(h, w) * 5.0
    gt = (11.0, 0.5, 0.0, 51.0, 0.0, -0.5)
    out, out_gt, epsg = dem_create(
        arr, gt, geoid_convert=True, geoid="EGM96", geoid_grid=planar_grid()
    )
    lons = 11.0 + (np.arange(w) + 0.5) * 0.5
    lats = 51.0 - (np.arange(h) + 0.5) * 0.5
    n = 10.0 + lats[:, None] / 10.0 + lons[None, :] / 20.0
    np.testing.assert_allclose(out, arr + n, atol=1e-9)
    assert epsg == 4326 and out_gt == gt


def test_dem_create_geoid_preserves_nodata():
    arr = np.full((3, 4), 100.0)
    arr[1, 2] = -32768.0
    gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    out, _, _ = dem_create(
        arr, gt, geoid_convert=True, geoid_grid=planar_grid(), nodata=-32768.0
    )
    assert out[1, 2] == -32768.0
    assert (out != arr)[0, 0]  # everything else shifted


def test_apply_respects_nan():
    g = planar_grid()
    arr = np.array([[1.0, np.nan], [2.0, 3.0]])
    out = g.apply(arr, (0.0, 1.0, 0.0, 2.0, 0.0, -1.0))
    assert np.isnan(out[0, 1])
    assert out[0, 0] != 1.0
