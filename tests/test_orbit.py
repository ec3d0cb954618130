"""Orbit ephemeris interpolation (stages/orbit.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.orbit import interpolate_orbit, lagrange_weights, node_states


def test_lagrange_weights_partition_of_unity():
    u = np.linspace(0.0, 1.0, 33)
    wm1, w0, w1, w2 = lagrange_weights(u)
    np.testing.assert_allclose(wm1 + w0 + w1 + w2, 1.0, atol=1e-12)


def test_lagrange_reproduces_cubic_exactly():
    """Cubic Lagrange on 4 nodes is exact for cubics (up to fp rounding)."""
    rng = np.random.default_rng(7)
    a, b, c, d = rng.uniform(-2, 2, 4)
    f = lambda t: ((a * t + b) * t + c) * t + d  # noqa: E731
    u = rng.uniform(0, 1, 50)
    wm1, w0, w1, w2 = lagrange_weights(u)
    got = wm1 * f(-1.0) + w0 * f(0.0) + w1 * f(1.0) + w2 * f(2.0)
    np.testing.assert_allclose(got, f(u), atol=1e-10)


def test_node_states_integer_exact():
    ids = np.array([3, 1000], dtype=np.int64)
    j = np.array([0, 1, 2016], dtype=np.int64)
    x = node_states(ids[:, None], j[None, :], "x")
    assert x.shape == (2, 3)
    # closed form: residue / 16 exactly
    assert x[0, 0] == ((3 * 2654435761) % 1048576) / 16.0
    assert x[1, 2] == ((1000 * 2654435761 + 2016 * 40503) % 1048576) / 16.0


def _inv(ids):
    start = np.asarray(ids, dtype=np.int64) * 1000
    return pa.table(
        {
            "osv_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "start_sec": pa.array(start),
        }
    )


def test_interpolate_matches_scalar_reference_and_drops_unmatched():
    duration, dt = 6000, 300
    inv = _inv([2, 5])
    probes = ray.data.from_arrow(
        pa.table(
            {
                "scene_key": pa.array([10, 11, 12], type=pa.int64()),
                "osv_id": pa.array([2, 5, -1], type=pa.int64()),
                "t_sec": pa.array([2000 + 450, 5000 + 5990, 0], type=pa.int64()),
            }
        )
    )
    out = (
        interpolate_orbit(probes, inv, duration, dt=dt)
        .to_pandas()
        .sort_values("scene_key", ignore_index=True)
    )
    assert list(out["scene_key"]) == [10, 11]  # unmatched row dropped
    n_nodes = duration // dt + 1
    for row, (oid, t) in zip(out.itertuples(), [(2, 2450), (5, 10990)]):
        off = t - oid * 1000
        i = int(np.clip(off // dt, 1, n_nodes - 3))
        u = (off - i * dt) / float(dt)
        wm1, w0, w1, w2 = lagrange_weights(np.array([u]))
        for dim in ("x", "y", "z"):
            nodes = node_states(
                np.array([oid], dtype=np.int64)[:, None],
                np.array([i - 1, i, i + 1, i + 2], dtype=np.int64)[None, :],
                dim,
            )[0]
            want = (
                wm1[0] * nodes[0] + w0[0] * nodes[1] + w1[0] * nodes[2] + w2[0] * nodes[3]
            )
            assert getattr(row, dim) == want


def test_end_clipping_keeps_stencil_in_grid():
    """Probes at the exact validity edges use the clipped stencil."""
    duration, dt = 1200, 300  # nodes j=0..4, i clipped to [1, 2]
    inv = _inv([7])
    probes = ray.data.from_arrow(
        pa.table(
            {
                "scene_key": pa.array([0, 1], type=pa.int64()),
                "osv_id": pa.array([7, 7], type=pa.int64()),
                "t_sec": pa.array([7000, 7000 + duration], type=pa.int64()),
            }
        )
    )
    out = interpolate_orbit(probes, inv, duration, dt=dt).to_pandas()
    assert len(out) == 2 and np.isfinite(out[["x", "y", "z"]].to_numpy()).all()
