"""Noise-power plan builder + executor — the engine twin of the
reference's second full processing chain (snap/util.py:706-876),
mirroring the plan-consistency semantics of tests/test_snap.py:27-45."""

import numpy as np
import pyarrow as pa
import pytest

from pyrosar_ray.pipelines.geocode import NoisePowerPixels, PlanExecutor
from pyrosar_ray.plan import build_noise_power, group_by_workers

S1_GRD = {
    "sensor": "S1A",
    "product": "GRD",
    "acquisition_mode": "IW",
    "polarizations": ["VV", "VH"],
    "spacing_rg": 10.0,
    "spacing_az": 10.0,
}


def test_grd_chain_shape():
    plan = build_noise_power(S1_GRD, spacing=20.0)
    assert plan.is_consistent()
    assert [n.operator for n in plan.nodes] == [
        "Read",
        "Apply-Orbit-File",
        "Calibration",
        "ThermalNoiseRemoval",
        "BandSelect",
        "Multilook",
        "Terrain-Correction",
        "Write",
    ]
    # suffix ordering matches the reference's wf.suffix() for this chain
    assert plan.suffix() == "Orb_Cal_NR_ML_TC"
    # ThermalNoiseRemoval co-locates with its source (CO_LOCATE), so
    # n=2 yields 3 groups, n=100 one
    assert len(group_by_workers(plan, 2)) == 3
    assert len(group_by_workers(plan, 100)) == 1


def test_slc_inserts_deburst():
    plan = build_noise_power({**S1_GRD, "product": "SLC"}, spacing=20.0)
    ops = [n.operator for n in plan.nodes]
    assert "TOPSAR-Deburst" in ops
    assert ops.index("TOPSAR-Deburst") == ops.index("ThermalNoiseRemoval") + 1
    # stripmap SLC gets no deburst
    plan = build_noise_power(
        {**S1_GRD, "product": "SLC", "acquisition_mode": "S3"}, spacing=20.0
    )
    assert "TOPSAR-Deburst" not in [n.operator for n in plan.nodes]


def test_band_selection_per_refarea():
    for refarea, measure in (("beta0", "NEBZ"), ("sigma0", "NESZ"), ("gamma0", "NEGZ")):
        plan = build_noise_power(S1_GRD, spacing=20.0, refarea=refarea)
        sel = plan["BandSelect"].parameters["sourceBands"]
        assert sel == [f"{measure}_VV", f"{measure}_VH"]
        cal = plan["Calibration"].parameters
        enabled = [k for k, v in cal.items() if k.startswith("output") and v is True]
        assert enabled == [f"output{refarea.capitalize()[:-1]}Band"]
    # noise node always requests the noise output
    assert plan["ThermalNoiseRemoval"].parameters["outputNoise"] is True


def test_validation_raises_like_reference():
    # snap/util.py:790-791
    with pytest.raises(ValueError, match="refarea not supported"):
        build_noise_power(S1_GRD, refarea="kappa0")
    # snap/util.py:795-796
    with pytest.raises(RuntimeError, match="Sentinel-1 only"):
        build_noise_power({**S1_GRD, "sensor": "TSX1"})
    with pytest.raises(TypeError):
        build_noise_power("not-a-record")
    with pytest.raises(RuntimeError, match="no polarization"):
        build_noise_power(S1_GRD, polarizations=["HH"])


def test_explicit_looks_and_unity_skip():
    plan = build_noise_power(S1_GRD, rlks=4, azlks=1)
    assert plan["Multilook"].parameters == {"rg": 4, "az": 1}
    plan = build_noise_power(S1_GRD, rlks=1, azlks=1)
    assert "Multilook" not in [n.operator for n in plan.nodes]


def test_executor_noise_kernel_golden():
    """PlanExecutor f32 path: outputNoise=True replaces the image with
    the calibrated range-ramped noise field, independent of input DNs."""
    plan = build_noise_power(S1_GRD, rlks=1, azlks=1, clean_edges=False)
    ex = PlanExecutor(plan, spacing=20.0)
    h, w = 4, 8
    arr = np.arange(h * w, dtype=np.float32).reshape(h, w)
    row = {"noise": 20.0, "cal_a": 10.0, "ulx": 11.0, "uly": 51.0,
           "xres": 20.0 / 111_320.0, "yres": 20.0 / 111_320.0}
    out = ex._apply("ThermalNoiseRemoval", {"outputNoise": True}, arr, row)
    ramp = 1.0 + np.arange(w) / (4.0 * w)
    expect = (20.0 * ramp) ** 2 / 100.0
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)
    np.testing.assert_array_equal(out[0], out[-1])  # range-only variation


def test_exact_pixel_stage_golden():
    """NoisePowerPixels over one closed-form raster reproduces the
    hand-computed interior: nesz_q = sum of the four squared DNs."""
    plan = build_noise_power(S1_GRD, spacing=20.0, clean_edges=True)
    stage = NoisePowerPixels(plan)
    doc_id = 7
    w, h = 16 + (doc_id % 9) * 2, 12 + (doc_id % 7) * 2
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    dn = (1 + (doc_id * 11 + y * 3 + x * 7) % 199).astype(np.uint8)
    batch = pa.table(
        {
            "image_id": pa.array([doc_id], type=pa.int64()),
            "bytes": pa.array([dn.tobytes()], type=pa.binary()),
            "w": pa.array([w], type=pa.int32()),
            "h": pa.array([h], type=pa.int32()),
        }
    )
    out = stage(batch)
    h2, w2 = h // 2, w // 2
    assert len(out) == (h2 - 2) * (w2 - 2)  # interior ring only
    d = dn.astype(np.int64)
    sq = d * d
    block = sq[0::2, 0::2] + sq[0::2, 1::2] + sq[1::2, 0::2] + sq[1::2, 1::2]
    got = {(r["y"], r["x"]): r["nesz_q"] for r in out.to_pylist()}
    for yy in range(1, h2 - 1):
        for xx in range(1, w2 - 1):
            assert got[(yy, xx)] == block[yy, xx]


def test_exact_stage_rejects_foreign_plan():
    from pyrosar_ray.plan import build_geocode

    geo = build_geocode(
        {"sensor": "S1A", "product": "GRD", "acquisition_mode": "IW",
         "polarizations": ["VV"]}
    )
    with pytest.raises(NotImplementedError, match="no noise-power kernel"):
        NoisePowerPixels(geo)
