"""Plan-driven geocode execution (pipelines/geocode.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.pipelines.geocode import PlanExecutor, boxcar, geocode_images
from pyrosar_ray.plan import Node, Plan, geocode_plan
from pyrosar_ray.plan import build_geocode


S1_RECORD = {
    "sensor": "S1A",
    "product": "GRD",
    "acquisition_mode": "IW",
    "polarizations": ["VV", "VH"],
}


def _rows(n=4, w=40, h=30, const=None, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if const is not None:
            arr = np.full((h, w), const, dtype=np.float32)
        else:
            arr = rng.uniform(100, 4000, (h, w)).astype(np.float32)
        rows.append(
            {
                "image_id": f"img-{i}",
                "bytes": arr.tobytes(),
                "w": w,
                "h": h,
                "ipf": 3.1,
            }
        )
    return pd.DataFrame(rows)


def test_boxcar_constant_preserved_and_window_mean():
    arr = np.full((5, 5), 7.0, dtype=np.float32)
    assert np.allclose(boxcar(arr), 7.0)
    arr2 = np.zeros((3, 3), dtype=np.float64)
    arr2[1, 1] = 9.0
    assert boxcar(arr2)[1, 1] == 1.0  # 9 / (3x3 window)
    with pytest.raises(ValueError):
        boxcar(arr, size=2)


def test_constant_image_closed_form():
    """A constant DN image through Cal→TNR→ML→TF→dB has a closed form."""
    plan = (
        Plan()
        .add(Node("Read", "Read", {}, []))
        .add(Node("Calibration", "Calibration", {}, ["Read"]))
        .add(Node("ThermalNoiseRemoval", "ThermalNoiseRemoval", {}, ["Calibration"]))
        .add(Node("Multilook", "Multilook", {"rg": 2, "az": 2}, ["ThermalNoiseRemoval"]))
        .add(Node("LinearToFromdB", "LinearToFromdB", {}, ["Multilook"]))
        .add(Node("Write", "Write", {}, ["LinearToFromdB"]))
    )
    dn = 2000.0
    ds = ray.data.from_pandas(_rows(n=2, const=dn))
    out = geocode_images(ds, plan, concurrency=1).to_pandas()
    sigma = (dn**2 - 25.0**2) / 1000.0**2
    expect_db = 10 * np.log10(sigma)
    row = out.iloc[0]
    arr = np.frombuffer(row["bytes"], dtype=np.float32).reshape(row["h"], row["w"])
    assert arr.shape == (15, 20)  # multilook 2x2 halves each axis
    assert np.allclose(arr, expect_db, atol=1e-4)
    assert row["outname"].endswith("_Cal_NR_ML_dB")


def test_full_reference_chain_runs_and_names():
    plan = geocode_plan()
    ds = ray.data.from_pandas(_rows(n=3, w=64, h=48))
    out = geocode_images(ds, plan, spacing=90.0, concurrency=1).to_pandas()
    assert len(out) == 3
    # suffix follows the authoritative snap.suffices order for the chain
    assert out["outname"].iloc[0] == "img-0_bnr_Cal_NR_Orb_ML_TF_TC_dB"
    arr = np.frombuffer(out.iloc[0]["bytes"], dtype=np.float32).reshape(
        out.iloc[0]["h"], out.iloc[0]["w"]
    )
    # TC out-of-grid pixels (0.0) map to the -99 dB nodata downstream
    valid = (arr != 0.0) & (arr != -99.0)
    # dB output lands in a plausible backscatter range
    assert valid.any() and (arr[valid] > -99.0).all() and (arr[valid] < 30.0).all()


def test_build_geocode_plan_executes():
    plan = build_geocode(S1_RECORD, spacing=60.0, speckle_filter="Boxcar")
    ds = ray.data.from_pandas(_rows(n=2, w=50, h=40))
    out = geocode_images(ds, plan, spacing=60.0, concurrency=1).to_pandas()
    assert len(out) == 2 and (out["w"] > 0).all()


def test_border_noise_gate_by_ipf():
    plan = (
        Plan()
        .add(Node("Read", "Read", {}, []))
        .add(Node("Remove-GRD-Border-Noise", "Remove-GRD-Border-Noise", {}, ["Read"]))
        .add(Node("Write", "Write", {}, ["Remove-GRD-Border-Noise"]))
    )
    ex = PlanExecutor(plan)
    low = np.full((4, 4), 20.0, dtype=np.float32)  # below raw threshold 30
    out_old = ex._apply("Remove-GRD-Border-Noise", {}, low, {"ipf": 2.5})
    out_new = ex._apply("Remove-GRD-Border-Noise", {}, low, {"ipf": 3.1})
    assert (out_old == 0).all()  # masked under the old IPF
    assert (out_new == 20.0).all()  # no-op at IPF >= 2.9


def test_branched_plan_rejected():
    plan = (
        Plan()
        .add(Node("Read", "Read", {}, []))
        .add(Node("Read2", "Read", {}, []))
        .add(Node("BandMerge", "BandMerge", {}, ["Read", "Read2"]))
    )
    with pytest.raises(NotImplementedError):
        PlanExecutor(plan)


def test_geocode_to_writer_roundtrip(tmp_path):
    """Full chain: plan execution → snap.writer export → GeoTIFF decode."""
    from pyrosar_ray.functions.tiff import decode_geotiff
    from pyrosar_ray.stages.raster_sink import write_products

    plan = build_geocode(S1_RECORD, spacing=60.0)
    suffix = plan.suffix()
    processed = geocode_images(
        ray.data.from_pandas(_rows(n=2, w=48, h=36)), plan, spacing=60.0, concurrency=1
    ).to_pandas()

    bands = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src_base": processed["outname"],
                "band": "Gamma0_VV",
                "data": processed["bytes"],
                "rows": processed["h"].astype("int64"),
                "cols": processed["w"].astype("int64"),
                "ulx": 11.0,
                "uly": 51.0,
                "xres": 6e-4,
                "yres": 6e-4,
            }
        )
    )
    manifest = write_products(
        bands, str(tmp_path), suffix=suffix, rtc=True
    ).to_pandas()
    assert len(manifest) == 2 and not manifest["skipped"].any()
    # writer grammar: Gamma0_VV + rtc + dB chain → VV_gamma0-rtc_db
    path = manifest["path"].iloc[0]
    assert path.endswith("_VV_gamma0-rtc_db.tif") and suffix not in path
    dec = decode_geotiff(open(path, "rb").read())
    got = dec["data"][0]
    src = processed.iloc[0]
    want = np.frombuffer(src["bytes"], dtype=np.float32).reshape(src["h"], src["w"])
    assert np.array_equal(got, want)
    assert dec["nodata"] == 0.0


def test_geocode_entry_point(tmp_path):
    from pyrosar_ray.pipelines.geocode import geocode

    manifest = geocode(
        ray.data.from_pandas(_rows(n=2, w=40, h=30)),
        S1_RECORD,
        str(tmp_path),
        spacing=90.0,
        speckle_filter="Boxcar",
    ).to_pandas()
    assert len(manifest) == 2 and not manifest["skipped"].any()
    assert all(p.endswith("_VV_gamma0-rtc_db.tif") for p in manifest["path"])
    # second run is a resume: everything skipped
    again = geocode(
        ray.data.from_pandas(_rows(n=2, w=40, h=30)),
        S1_RECORD,
        str(tmp_path),
        spacing=90.0,
        speckle_filter="Boxcar",
    ).to_pandas()
    assert again["skipped"].all()


def test_xml_roundtrip_plan_executes():
    """Workflow XML → Plan → fused execution: the serialized graph is
    runnable, tying the SNAP XML grammar to the executor."""
    from pyrosar_ray.plan_xml import plan_from_xml, plan_to_xml

    plan = build_geocode(S1_RECORD, spacing=90.0)
    blob = plan_to_xml(plan)
    back = plan_from_xml(blob)
    assert back.ids() == plan.ids()
    out = geocode_images(
        ray.data.from_pandas(_rows(n=1, w=40, h=30)), back, spacing=90.0, concurrency=1
    ).to_pandas()
    assert len(out) == 1
    assert out["outname"].iloc[0].endswith(plan.suffix())


# ---------------------------------------------------------- SliceAssembly


def _slice_rows():
    """Two passes x two adjacent slices, constant-valued float32 arrays."""
    rows = []
    for p, (v1, v2) in enumerate([(2000.0, 3000.0), (1000.0, 4000.0)]):
        for s, (v, h) in enumerate([(v1, 6), (v2, 4)]):
            arr = np.full((h, 8), v, dtype=np.float32)
            rows.append(
                {
                    "image_id": f"img-{p}-{s}",
                    "bytes": arr.tobytes(),
                    "w": 8,
                    "h": h,
                    "pass_id": f"pass-{p}",
                    "slice_idx": s,
                    "start_sec": 100.0 * p + 10.0 * s,
                    "stop_sec": 100.0 * p + 10.0 * s + 10.0,
                }
            )
    return pd.DataFrame(rows)


def test_slice_assembly_concatenates_along_azimuth():
    from pyrosar_ray.pipelines.geocode import slice_assembly

    out = (
        slice_assembly(
            ray.data.from_pandas(_slice_rows()),
            group_col="pass_id",
            order_col="slice_idx",
            start_col="start_sec",
            stop_col="stop_sec",
        )
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    assert out["image_id"].tolist() == ["pass-0", "pass-1"]
    assert out["h"].tolist() == [10, 10] and out["w"].tolist() == [8, 8]
    a0 = np.frombuffer(out["bytes"].iloc[0], dtype=np.float32).reshape(10, 8)
    assert (a0[:6] == 2000.0).all() and (a0[6:] == 3000.0).all()


def test_slice_assembly_rejects_gaps_and_width_mismatch():
    from pyrosar_ray.pipelines.geocode import slice_assembly

    rows = _slice_rows()
    rows.loc[1, "start_sec"] = 999.0  # tear pass-0 apart
    with pytest.raises(Exception):  # Ray wraps the ValueError
        slice_assembly(
            ray.data.from_pandas(rows),
            group_col="pass_id",
            order_col="slice_idx",
            start_col="start_sec",
            stop_col="stop_sec",
        ).to_pandas()

    rows = _slice_rows()
    arr = np.full((4, 9), 1.0, dtype=np.float32)  # width 9 != 8
    rows.loc[1, "bytes"] = arr.tobytes()
    rows.loc[1, "w"] = 9
    rows.loc[1, "h"] = 4
    with pytest.raises(Exception):
        slice_assembly(
            ray.data.from_pandas(rows), group_col="pass_id", order_col="slice_idx"
        ).to_pandas()


def test_geocode_images_splits_around_assembly_golden():
    """Closed-form two-slice pipeline: Cal then assembly then dB.
    sigma0 = DN^2/A^2 with A=1000 -> dB = 10*log10(sigma0)."""
    plan = (
        Plan()
        .add(Node("Read", "Read", {}, []))
        .add(Node("Calibration", "Calibration", {}, ["Read"]))
        .add(Node("SliceAssembly", "SliceAssembly", {}, ["Calibration"]))
        .add(Node("LinearToFromdB", "LinearToFromdB", {}, ["SliceAssembly"]))
        .add(Node("Write", "Write", {"file": "out"}, ["LinearToFromdB"]))
    )
    out = (
        geocode_images(
            ray.data.from_pandas(_slice_rows()),
            plan,
            concurrency=1,
            group_col="pass_id",
            order_col="slice_idx",
        )
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
    )
    assert out["image_id"].tolist() == ["pass-0", "pass-1"]
    assert out["outname"].iloc[0] == "pass-0_" + plan.suffix()
    a0 = np.frombuffer(out["bytes"].iloc[0], dtype=np.float32).reshape(10, 8)
    want_top = 10.0 * np.log10((2000.0**2) / 1e6)
    want_bot = 10.0 * np.log10((3000.0**2) / 1e6)
    np.testing.assert_allclose(a0[:6], np.float32(want_top), rtol=1e-6)
    np.testing.assert_allclose(a0[6:], np.float32(want_bot), rtol=1e-6)


def test_build_geocode_nscenes_inserts_assembly():
    plan = build_geocode(S1_RECORD, nscenes=2)
    ops = [n.operator for n in plan.nodes]
    i = ops.index("SliceAssembly")
    assert ops[i - 1] == "ThermalNoiseRemoval"
    assert "Asm" in plan.suffix()
    # single-scene plans are unchanged
    assert "SliceAssembly" not in [n.operator for n in build_geocode(S1_RECORD)]
    # the per-row executor refuses assembly nodes (grouping stage)
    with pytest.raises(NotImplementedError):
        PlanExecutor(plan)


def _ml_plan(extra_param=None):
    params = {"rg": 2, "az": 2}
    if extra_param:
        params[extra_param] = 1
    return (
        Plan()
        .add(Node("Read", "Read", {}, []))
        .add(Node("Multilook", "Multilook", dict(params), ["Read"]))
        .add(Node("Write", "Write", {}, ["Multilook"]))
    )


def test_kernel_exceptions_override_operator():
    """gpt_exceptions twin: the named operator's node runs the override
    kernel instead of the default (reference snap/auxil.py:229-235)."""
    import ray.data as rd

    images = rd.from_pandas(_rows(n=2, seed=3))
    default = geocode_images(images, _ml_plan(), batch_size=2).to_pandas()
    ident = geocode_images(
        images,
        _ml_plan(),
        batch_size=2,
        kernel_exceptions={"Multilook": lambda params, arr, row: arr},
    ).to_pandas()
    # override skipped the 2x2 block-mean: full-size output, raw pixels
    src = _rows(n=2, seed=3)
    assert (ident["w"] == src["w"]).all() and (ident["h"] == src["h"]).all()
    assert (default["w"] == src["w"] // 2).all()
    assert ident["bytes"][0] == src["bytes"][0]


def test_unknown_parameter_repair_and_strict():
    """Unknown-element recovery (reference auxil.py:280-288): repair
    drops the parameter and executes the modified workflow (identical
    result to the clean plan); repair=False raises the gpt-shaped
    error."""
    import ray.data as rd

    ex = PlanExecutor(_ml_plan(extra_param="window"))
    assert ex.repaired == [("Multilook", "window")]

    images = rd.from_pandas(_rows(n=2, seed=5))
    clean = geocode_images(images, _ml_plan(), batch_size=2).to_pandas()
    repaired = geocode_images(images, _ml_plan("window"), batch_size=2).to_pandas()
    assert (repaired["bytes"] == clean["bytes"]).all()

    with pytest.raises(ValueError, match="Unknown element 'window'"):
        PlanExecutor(_ml_plan(extra_param="window"), repair=False)
