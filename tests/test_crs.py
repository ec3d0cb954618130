"""UTM transform + reprojecting warp tests (the gdalwarp -t_srs twin)."""

import numpy as np
import pytest

from pyrosar_ray.functions.crs import (
    epsg_to_utm,
    meridian_arc,
    parse_epsg,
    transform_points,
    utm_forward,
    utm_inverse,
    utm_zone_for,
)
from pyrosar_ray.functions.warp import warp_reproject


def test_central_meridian_against_quadrature():
    # on the central meridian: E is exactly the false easting and
    # N equals k0 x meridian arc length - checked against an
    # independent Simpson quadrature of the closed-form integrand
    east, north = utm_forward(3.0, 45.0, 31, True)
    assert float(east) == pytest.approx(500000.0, abs=1e-6)
    assert float(north) == pytest.approx(0.9996 * meridian_arc(45.0), abs=1e-4)
    east0, north0 = utm_forward(3.0, 0.0, 31, True)
    assert (float(east0), float(north0)) == (500000.0, 0.0)


def test_roundtrip_machine_precision():
    rng = np.random.RandomState(0)
    lon = 3 + rng.uniform(-3, 3, 500)
    lat = rng.uniform(-80, 84, 500)
    east, north = utm_forward(lon, lat, 31, True)
    lon2, lat2 = utm_inverse(east, north, 31, True)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12


def test_south_false_northing():
    east, north = utm_forward(-60.0, -33.0, 21, False)
    assert 0 < north < 10000000.0  # south zones offset by 10^7
    lon, lat = utm_inverse(east, north, 21, False)
    assert (float(lon), float(lat)) == pytest.approx((-60.0, -33.0), abs=1e-12)


def test_zone_and_epsg_helpers():
    assert utm_zone_for(11.5, 51.0) == (32, True)
    assert utm_zone_for(-60.0, -33.0) == (21, False)
    assert epsg_to_utm(32632) == (32, True)
    assert epsg_to_utm(32721) == (21, False)
    with pytest.raises(RuntimeError):
        epsg_to_utm(4326)
    assert parse_epsg("EPSG:32632") == 32632
    with pytest.raises(RuntimeError):
        parse_epsg("foobar")


def test_transform_points_dispatch():
    x, y = transform_points([11.0], [51.0], 4326, 4326)
    assert (x[0], y[0]) == (11.0, 51.0)
    e, n = transform_points([9.0], [51.0], "EPSG:4326", 32632)
    assert float(e) == pytest.approx(500000.0, abs=1e-6)
    lon, lat = transform_points(e, n, 32632, 4326)
    assert (float(lon), float(lat)) == pytest.approx((9.0, 51.0), abs=1e-12)


def test_warp_reproject_linear_field():
    # source raster whose value is a linear function of lon/lat:
    # bilinear resampling in any grid reproduces it exactly at interior
    # pixels, so the reprojected grid must match the analytic field
    h, w = 60, 80
    ulx, uly, res = 8.0, 52.0, 0.01
    lon = ulx + (np.arange(w) + 0.5) * res
    lat = uly - (np.arange(h) + 0.5) * res
    src = 3.0 * lon[None, :] + 7.0 * lat[:, None]
    out, gt = warp_reproject(
        src, (ulx, res, 0, uly, 0, -res), 4326, 32632, tr=(100.0, 100.0)
    )
    xs = gt[0] + (np.arange(out.shape[1]) + 0.5) * gt[1]
    ys = gt[3] - (np.arange(out.shape[0]) + 0.5) * 100.0
    gx, gy = np.meshgrid(xs, ys)
    lon_c, lat_c = transform_points(gx.ravel(), gy.ravel(), 32632, 4326)
    want = (3.0 * lon_c + 7.0 * lat_c).reshape(out.shape)
    inside = ~np.isnan(out)
    assert inside.mean() > 0.5  # zone grid covers the tile's envelope
    # strict interior: edge pixels clamp (no extrapolation), like gdal
    interior = (
        inside
        & (lon_c.reshape(out.shape) > ulx + res)
        & (lon_c.reshape(out.shape) < ulx + (w - 1) * res)
        & (lat_c.reshape(out.shape) < uly - res)
        & (lat_c.reshape(out.shape) > uly - (h - 1) * res)
    )
    assert interior.sum() > 1000
    assert np.abs(out[interior] - want[interior]).max() < 1e-9
    # TAP: bounds are multiples of the resolution
    assert gt[0] % 100.0 == 0.0 and gt[3] % 100.0 == 0.0


def test_warp_reproject_nodata_and_inverse_direction():
    src = np.full((40, 40), 5.0)
    src[10, 10] = -32768.0
    out, gt = warp_reproject(
        src, (11.0, 0.01, 0, 51.0, 0, -0.01), 4326, 32632,
        tr=(200.0, 200.0), nodata=-32768.0,
    )
    vals = np.unique(out[~np.isnan(out)])
    assert all(np.isclose(v, 5.0) or v == -32768.0 for v in vals)
    # and back: UTM -> 4326
    back, gt2 = warp_reproject(
        out, gt, 32632, 4326, tr=(0.02, 0.02), nodata=-32768.0
    )
    ok = back[(back != -32768.0) & ~np.isnan(back)]
    assert len(ok) and np.abs(ok - 5.0).max() < 1e-9
