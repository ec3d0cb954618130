"""Orbit ephemeris interpolation: state vectors at scene acquisition times.

The reference hands matched OSV files to SNAP, which interpolates the
file's 10-second state-vector grid at each pixel's zero-Doppler time
(pyroSAR S1/auxil.py:91-692 supplies the files; the interpolation is
SNAP's orbit propagator). The engine realizes that step as a Ray stage:
the matched probe stream flows through an actor pool whose ``__init__``
materializes the full ephemeris node matrix ONCE per actor from the
``ray.put`` inventory (broadcast small side), and ``__call__``
interpolates whole batches with a vectorized cubic Lagrange kernel on
the uniform node grid — no shuffle, probe-stream streaming preserved.

Node grid: each OSV file covers ``[start_sec, start_sec + duration]``
with nodes every ``dt`` seconds (j = 0..duration/dt). Node states here
are closed-form integer arithmetic in (osv_id, j) — exact in float64 —
so the DuckDB twin recomputes the same four neighbor nodes inline and
the interpolation hash-checks bit-for-bit (same IEEE expression order).

Lagrange weights for nodes at offsets (-1, 0, 1, 2) around interval i,
with u = fractional position in [0, 1):

    w_m1 = -u*(u-1)*(u-2)/6       w_0 = (u+1)*(u-1)*(u-2)/2
    w_1  = -(u+1)*u*(u-2)/2       w_2 = (u+1)*u*(u-1)/6
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

# closed-form node state mixers (one per dimension); values land in
# [0, 65536) after the exact /16.0 of a 20-bit residue
_DIM_MIX = {
    "x": (2654435761, 40503),
    "y": (97, 1000003),
    "z": (8191, 131071),
}
_NODE_MOD = 1048576  # 2^20 — residue/16.0 is exact in float64


def node_states(osv_ids: np.ndarray, j: np.ndarray, dim: str) -> np.ndarray:
    """State value of dimension ``dim`` at nodes ``j`` of files ``osv_ids``
    (broadcasting): ((id*a + j*b) % 2^20) / 16.0, all-integer then an
    exact power-of-two division."""
    a, b = _DIM_MIX[dim]
    return ((osv_ids * a + j * b) % _NODE_MOD) / 16.0


def lagrange_weights(u: np.ndarray):
    """Cubic Lagrange weights at fractional position ``u`` (IEEE order
    mirrored verbatim by the SQL twin)."""
    wm1 = -u * (u - 1.0) * (u - 2.0) / 6.0
    w0 = (u + 1.0) * (u - 1.0) * (u - 2.0) / 2.0
    w1 = -(u + 1.0) * u * (u - 2.0) / 2.0
    w2 = (u + 1.0) * u * (u - 1.0) / 6.0
    return wm1, w0, w1, w2


def interpolate_orbit(
    probes: Dataset,
    inventory: pa.Table,
    duration: int,
    dt: int = 300,
    id_col: str = "osv_id",
    time_col: str = "t_sec",
    keep_cols: tuple[str, ...] = ("scene_key",),
    concurrency=(1, 4),
) -> Dataset:
    """Append interpolated (x, y, z) to matched probe rows.

    ``probes`` carry ``osv_id`` (from :func:`asof_match`; rows with
    ``osv_id < 0`` are dropped — unmatched scenes have no ephemeris)
    and ``t_sec``. The inventory's (osv_id, start_sec) pairs are
    broadcast once; each actor materializes the (files x nodes x dims)
    ephemeris matrix in ``__init__`` (the stateful-stage contract —
    at 1000 files x 2017 nodes x 3 dims that is ~48 MB per actor,
    documented: real ephemerides would be range-partitioned by file
    instead of broadcast past ~10^5 files).

    ``concurrency`` is an AUTOSCALING (1, 4) pool on purpose: this
    stage chains after asof_match's fixed pool of 4, and two fixed
    pools whose sizes sum to the CPU count starve the upstream read
    tasks into a deadlock (observed at num_cpus=8; the scaling
    protocol's num_cpus=1 livelock is the same mechanism).
    """
    n_nodes = duration // dt + 1  # j = 0 .. duration/dt inclusive
    inv_ref = ray.put(
        inventory.select(["osv_id", "start_sec"]).combine_chunks()
    )

    class _Interp:
        def __init__(self):
            tab = ray.get(inv_ref)
            ids = tab["osv_id"].to_numpy()
            order = np.argsort(ids)
            self.ids = ids[order]
            self.start = tab["start_sec"].to_numpy()[order]
            j = np.arange(n_nodes, dtype=np.int64)
            self.nodes = {
                d: node_states(self.ids[:, None], j[None, :], d)
                for d in ("x", "y", "z")
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            oid = batch[id_col].to_numpy()
            keep = oid >= 0
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                oid = oid[keep]
            t = batch[time_col].to_numpy()
            row = np.searchsorted(self.ids, oid)
            off = t - self.start[row]
            i = np.clip(off // dt, 1, n_nodes - 3)
            u = (off - i * dt) / float(dt)
            wm1, w0, w1, w2 = lagrange_weights(u)
            cols = {c: batch[c] for c in keep_cols}
            cols[id_col] = batch[id_col]
            for d in ("x", "y", "z"):
                m = self.nodes[d]
                cols[d] = pa.array(
                    wm1 * m[row, i - 1] + w0 * m[row, i] + w1 * m[row, i + 1] + w2 * m[row, i + 2]
                )
            return pa.table(cols)

    return probes.map_batches(_Interp, batch_format="pyarrow", concurrency=concurrency)
