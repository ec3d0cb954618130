"""Plan-driven geocode execution over image rows — SURVEY.md §3.3 realized.

The reference materializes the validated SNAP plan as XML, chunks it with
``groupbyWorkers``/``split`` and runs every sub-workflow as a ``gpt``
subprocess over BEAM-DIMAP intermediates on shared disk
(snap/auxil.py:193-306, 586-767). The engine executes the SAME
:class:`~pyrosar_ray.plan.Plan` as ONE fused actor-pool ``map_batches``
stage: each SNAP operator maps to a vectorized numpy kernel applied in
sequence inside the actor's ``__call__``, so intermediates live in worker
memory and never touch disk or the object store — Ray's stage fusion is
the engine twin of the reference's worker grouping.

Kernel fidelity per operator (σ⁰ convention, single-band GRD rows):

- ``Remove-GRD-Border-Noise`` — denoise mask from the calibration-scaled
  noise LUT (reference S1/auxil.py:782-802 via
  ``functions.raster.border_noise_mask``); IPF ≥ 2.9 rows are a no-op
  exactly like the reference's version gate (S1/auxil.py:737-743).
- ``Calibration`` — σ⁰ = DN²/A² with the per-product calibration
  constant ``A`` (the reference delegates to SNAP's Calibration; the
  radiometric formula is the published S1 one).
- ``ThermalNoiseRemoval`` — subtract the thermal floor, clamp at 0.
- ``Apply-Orbit-File`` / ``TOPSAR-Deburst`` — geolocation-metadata
  operators; pixel values are untouched (GRD rows carry no bursts).
- ``Multilook`` — block-mean via ``functions.raster.multilook``.
- ``Terrain-Flattening`` — γ⁰ = σ⁰ · tan(θ_loc)⁻¹·tan(θ_ell) reduces to
  σ⁰/cos(θ) under the flat-ellipsoid model the engine can evaluate
  without a DEM; θ ramps linearly across range between the scene's
  near/far incidence (the reference's DEM-driven TF needs SNAP).
- ``Speckle-Filter`` — Boxcar mean via an integral image (edge-clipped
  window, the SNAP Boxcar default 3×3).
- ``Terrain-Correction`` — regrid onto the target-aligned output grid at
  the requested spacing via ``functions.warp.warp_affine`` (bilinear,
  TAP — the engine's ``gdalwarp`` twin).
- ``LinearToFromdB`` — 10·log10 via ``functions.raster.linear_to_db``.
- ``Write`` — rows keep float32 bytes + the plan's suffix-derived
  ``outname`` (``{image_id}_{suffix}``), ready for
  ``stages.raster_sink.write_rasters`` or the GeoTIFF encoder.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.raster import border_noise_mask, linear_to_db, multilook
from ..functions.warp import warp_affine
from ..plan import Plan

#: operators whose kernel leaves pixel values untouched (metadata-only
#: in the engine's model; the reference runs them for geolocation)
_METADATA_OPS = frozenset(
    {"Read", "Write", "Apply-Orbit-File", "TOPSAR-Deburst", "Subset", "BandSelect"}
)

#: default radiometric constants for rows that don't carry their own
_DEFAULT_CAL_A = 1000.0
_DEFAULT_NOISE = 25.0
_DEFAULT_INCIDENCE = (30.0, 46.0)  # S1 IW near/far, degrees


def boxcar(arr: np.ndarray, size: int = 3) -> np.ndarray:
    """Edge-clipped boxcar mean via an integral image (SNAP Boxcar twin)."""
    if size < 1 or size % 2 == 0:
        raise ValueError("boxcar size must be a positive odd number")
    h, w = arr.shape
    r = size // 2
    cum = np.zeros((h + 1, w + 1), dtype=np.float64)
    cum[1:, 1:] = arr.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    y0 = np.clip(np.arange(h) - r, 0, None)
    y1 = np.clip(np.arange(h) + r + 1, None, h)
    x0 = np.clip(np.arange(w) - r, 0, None)
    x1 = np.clip(np.arange(w) + r + 1, None, w)
    sums = cum[y1[:, None], x1[None, :]] - cum[y0[:, None], x1[None, :]] \
        - cum[y1[:, None], x0[None, :]] + cum[y0[:, None], x0[None, :]]
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return (sums / areas).astype(arr.dtype)


class PlanExecutor:
    """Actor-pool stage running a linear geocode Plan per image row.

    The plan is validated and linearized once per actor in ``__init__``
    (stateful setup); ``__call__`` applies the kernel chain per row.
    Branched plans (BandMerge joins) are stage-fusion groups the engine
    runs as separate stages — this executor covers the linear chains
    ``build_geocode`` emits.
    """

    #: declared kernel-parameter schemas — ops listed here reject unknown
    #: parameters exactly like ``gpt -e``'s "Unknown element" error
    #: (reference snap/auxil.py:264-272); unlisted ops carry free-form
    #: parameters (Write's file/formatName etc.).
    _KERNEL_PARAMS = {"Multilook": {"rg", "az"}, "Speckle-Filter": {"size"}}

    def __init__(
        self,
        plan: Plan,
        spacing: float = 20.0,
        suffix_override: str | None = None,
        passthrough: tuple[str, ...] = (),
        kernel_exceptions: dict | None = None,
        repair: bool = True,
    ):
        """``kernel_exceptions`` maps an operator name to a replacement
        kernel ``fn(params, arr, row) -> arr`` — the engine twin of the
        reference's ``gpt_exceptions`` executable override for workflows
        containing that operator (snap/auxil.py:229-235), applied at the
        node the operator names. ``repair=True`` reproduces the
        reference's unknown-element recovery (auxil.py:280-288): a
        parameter a kernel's schema doesn't declare is removed from the
        (in-memory) plan with a log line and execution proceeds;
        ``repair=False`` surfaces the gpt-shaped error instead."""
        if not plan.is_consistent():
            raise ValueError("plan has unresolved source links")
        self.kernel_exceptions = dict(kernel_exceptions or {})
        self.repaired: list[tuple[str, str]] = []
        for node in plan:
            known = self._KERNEL_PARAMS.get(node.operator)
            if known is None or node.operator in self.kernel_exceptions:
                continue
            for par in [p for p in node.parameters if p not in known]:
                if not repair:
                    raise ValueError(
                        f"Error: [NodeId: {node.id}] Operator "
                        f"{node.operator!r}: Unknown element {par!r}"
                    )
                import logging

                logging.getLogger(__name__).info(
                    "removing parameter %s:%s and executing modified workflow",
                    node.id, par,
                )
                del node.parameters[par]
                self.repaired.append((node.id, par))
        for node in plan:
            if len(node.sources) > 1:
                raise NotImplementedError(
                    "PlanExecutor runs linear chains; split branched plans "
                    "with plan.split() into per-group stages"
                )
            if node.operator == "SliceAssembly":
                raise NotImplementedError(
                    "SliceAssembly is a grouping stage, not a per-row kernel;"
                    " run the plan through geocode_images (it splits the "
                    "chain around the assembly automatically)"
                )
        self.nodes = [n for n in plan.nodes]
        self.suffix = plan.suffix() if suffix_override is None else suffix_override
        self.passthrough = tuple(passthrough)
        self.spacing = float(spacing)

    # ---- per-operator kernels -----------------------------------------
    def _apply(self, op: str, params: dict, arr: np.ndarray, row: dict) -> np.ndarray:
        if op in self.kernel_exceptions:
            return self.kernel_exceptions[op](params, arr, row)
        if op == "Write" and params.get("clean_edges"):
            # noise_power applies edge erosion in the post-gpt writer step
            # (reference snap/util.py:874-875) — same placement here.
            from ..functions.raster import erode_edges

            return erode_edges(arr[None, ...], pixels=1)[0]
        if op in _METADATA_OPS:
            return arr
        if op == "Remove-GRD-Border-Noise":
            if float(row.get("ipf", 2.9)) >= 2.9:
                return arr  # reference version gate: nothing to remove
            h, w = arr.shape
            noise = np.full((h, w), float(row.get("noise", _DEFAULT_NOISE)))
            keep = border_noise_mask(arr, noise, scale=1.0)
            return np.where(keep, arr, 0.0).astype(arr.dtype)
        if op == "Calibration":
            a = float(row.get("cal_a", _DEFAULT_CAL_A))
            return (arr.astype(np.float64) ** 2 / (a * a)).astype(np.float32)
        if op == "ThermalNoiseRemoval":
            floor = float(row.get("noise", _DEFAULT_NOISE))
            cal_a = float(row.get("cal_a", _DEFAULT_CAL_A))
            if params.get("outputNoise"):
                # noise_power chain: the product BECOMES the calibrated
                # noise-equivalent image (NE?Z). The thermal-noise DN
                # floor ramps linearly across range (S1 noise vectors
                # rise toward far range), calibrated like the signal.
                w = arr.shape[1]
                ramp = 1.0 + np.arange(w, dtype=np.float64) / (4.0 * w)
                field = (floor * ramp[None, :]) ** 2 / cal_a**2
                return np.broadcast_to(field, arr.shape).astype(np.float32)
            sigma_floor = floor**2 / cal_a**2
            return np.maximum(arr - sigma_floor, 0.0).astype(arr.dtype)
        if op == "Multilook":
            rg = int(params.get("rg", 2))
            az = int(params.get("az", 2))
            return multilook(arr, rg, az)
        if op == "Terrain-Flattening":
            near, far = (
                float(row.get("inc_near", _DEFAULT_INCIDENCE[0])),
                float(row.get("inc_far", _DEFAULT_INCIDENCE[1])),
            )
            theta = np.deg2rad(np.linspace(near, far, arr.shape[1]))
            return (arr / np.cos(theta)[None, :]).astype(arr.dtype)
        if op == "Speckle-Filter":
            return boxcar(arr, int(params.get("size", 3)))
        if op == "Terrain-Correction":
            gt = (
                float(row.get("ulx", 11.0)),
                float(row.get("xres", 1e-4)),
                0.0,
                float(row.get("uly", 51.0)),
                0.0,
                -float(row.get("yres", 1e-4)),
            )
            h, w = arr.shape
            bounds = (gt[0], gt[3] - h * abs(gt[5]), gt[0] + w * gt[1], gt[3])
            # target resolution: the requested spacing in degrees-at-
            # equator (the reference converts meters via the target CRS)
            tr = self.spacing / 111_320.0
            out, _ = warp_affine(arr, gt, bounds, (tr, tr), nodata=0.0)
            return np.nan_to_num(out, nan=0.0).astype(np.float32)
        if op == "LinearToFromdB":
            return linear_to_db(arr).astype(np.float32)
        raise NotImplementedError(f"no kernel for operator {op!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        extra_cols = [
            c for c in ("ipf", "cal_a", "noise", "inc_near", "inc_far",
                        "ulx", "uly", "xres", "yres")
            if c in batch.column_names
        ]
        extras = {c: batch[c].to_pylist() for c in extra_cols}
        out_blob, out_w, out_h, out_name = [], [], [], []
        for i, (iid, blob, w, h) in enumerate(zip(ids, blobs, ws, hs)):
            row = {c: extras[c][i] for c in extra_cols}
            arr = np.frombuffer(blob, dtype=np.float32).reshape(h, w)
            for node in self.nodes:
                arr = self._apply(node.operator, node.parameters, arr, row)
            out_blob.append(np.ascontiguousarray(arr, dtype=np.float32).tobytes())
            out_h.append(arr.shape[0])
            out_w.append(arr.shape[1])
            out_name.append(f"{iid}_{self.suffix}" if self.suffix else iid)
        cols = {
            "image_id": pa.array(ids, type=pa.string()),
            "outname": pa.array(out_name, type=pa.string()),
            "bytes": pa.array(out_blob, type=pa.binary()),
            "w": pa.array(out_w, type=pa.int32()),
            "h": pa.array(out_h, type=pa.int32()),
        }
        for c in self.passthrough:
            cols[c] = batch[c]
        return pa.table(cols)


def _split_at_assembly(plan: Plan) -> tuple[Plan, Plan | None]:
    """Split a plan around its SliceAssembly node.

    Returns (pre, None) for plans without assembly; else (pre, post)
    where ``pre`` is the per-slice chain (Read…ThermalNoiseRemoval) and
    ``post`` the per-product chain after assembly, with the first post
    node re-rooted (its source was the assembly node).
    """
    from ..plan import Node

    ops = [n.operator for n in plan.nodes]
    if "SliceAssembly" not in ops:
        return plan, None
    i = ops.index("SliceAssembly")
    pre = Plan(list(plan.nodes[:i]))
    post_nodes = []
    for j, n in enumerate(plan.nodes[i + 1 :]):
        post_nodes.append(
            Node(n.id, n.operator, n.parameters, [] if j == 0 else list(n.sources))
        )
    return pre, Plan(post_nodes)


def slice_assembly(
    slices: Dataset,
    group_col: str = "pass_id",
    order_col: str = "slice_idx",
    start_col: str | None = None,
    stop_col: str | None = None,
    tol: float = 1.0,
) -> Dataset:
    """Concatenate adjacent slices of one pass along azimuth.

    The engine twin of SNAP's SliceAssembly (reference inserts it for
    multi-scene inputs, snap/util.py:392-396): rows sharing
    ``group_col`` are ordered by ``order_col`` and their float32 pixel
    arrays stacked along the azimuth (row) axis; widths must agree.
    When ``start_col``/``stop_col`` are given, temporal adjacency is
    enforced — a gap larger than ``tol`` seconds between one slice's
    stop and the next one's start raises (non-adjacent slices are not
    one pass). One groupby shuffle; per-group memory is the assembled
    product, the same bound the reference's SNAP process pays.
    """
    import pandas as pd

    def _asm(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_col, kind="mergesort")
        arrs = [
            np.frombuffer(b, dtype=np.float32).reshape(h, w)
            for b, h, w in zip(g["bytes"], g["h"], g["w"])
        ]
        widths = {a.shape[1] for a in arrs}
        if len(widths) != 1:
            raise ValueError(
                f"slice widths differ ({sorted(widths)}); cannot assemble along azimuth"
            )
        if start_col and stop_col and len(g) > 1:
            starts = g[start_col].to_numpy(dtype=np.float64)
            stops = g[stop_col].to_numpy(dtype=np.float64)
            gaps = starts[1:] - stops[:-1]
            if (gaps > tol).any():
                raise ValueError(
                    f"non-adjacent slices in group {g[group_col].iloc[0]!r}: "
                    f"max gap {gaps.max():.3f}s > tol {tol}s"
                )
        out = np.concatenate(arrs, axis=0)
        return pd.DataFrame(
            {
                "image_id": [str(g[group_col].iloc[0])],
                "bytes": [np.ascontiguousarray(out).tobytes()],
                "w": [np.int32(out.shape[1])],
                "h": [np.int32(out.shape[0])],
            }
        )

    return slices.groupby(group_col).map_groups(_asm, batch_format="pandas")


def geocode_images(
    images: Dataset,
    plan: Plan,
    spacing: float = 20.0,
    concurrency=(1, 4),
    batch_size: int = 32,
    group_col: str = "pass_id",
    order_col: str = "slice_idx",
    kernel_exceptions: dict | None = None,
) -> Dataset:
    """Run a validated geocode Plan over an image Dataset as one fused
    actor stage (bounded ``batch_size`` keeps payload × concurrency in
    the worker heap; see stages.images for the memory rule).

    Plans containing a SliceAssembly node (``build_geocode(nscenes>1)``)
    execute as three stages: the per-slice chain (suffix-less, columns
    ``group_col``/``order_col`` passed through), ONE groupby assembly
    exchange, then the per-product chain carrying the full plan suffix —
    so the assembled outname matches the single-scene spelling.
    """
    pre, post = _split_at_assembly(plan)
    if post is None:
        return images.map_batches(
            PlanExecutor,
            fn_constructor_args=(plan, spacing),
            fn_constructor_kwargs={"kernel_exceptions": kernel_exceptions},
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
        )
    per_slice = images.map_batches(
        PlanExecutor,
        fn_constructor_args=(pre, spacing),
        fn_constructor_kwargs={
            "suffix_override": "",
            "passthrough": (group_col, order_col),
            "kernel_exceptions": kernel_exceptions,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    assembled = slice_assembly(per_slice, group_col=group_col, order_col=order_col)
    full_suffix = plan.suffix()
    return assembled.map_batches(
        PlanExecutor,
        fn_constructor_args=(post, spacing),
        fn_constructor_kwargs={
            "suffix_override": full_suffix,
            "kernel_exceptions": kernel_exceptions,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def geocode(
    images: Dataset,
    record: dict,
    outdir: str,
    spacing: float = 20.0,
    polarization: str = "VV",
    ulx: float = 11.0,
    uly: float = 51.0,
    xres: float = 6e-4,
    yres: float = 6e-4,
    gpt_exceptions: dict | None = None,
    **build_kwargs,
) -> Dataset:
    """The reference-spelled entry point: validate + build the plan
    (``plan.build_geocode``), execute it as one fused actor stage, and
    export every product through the snap.writer grammar
    (``stages.raster_sink.write_products``). Returns the write manifest
    Dataset (band, path, nodata, skipped) — resumable like every
    engine sink: already-written products are skipped.
    """
    import pyarrow as pa

    from ..plan import build_geocode
    from ..stages.raster_sink import write_products

    plan = build_geocode(record, spacing=spacing, **build_kwargs)
    suffix = plan.suffix()
    processed = geocode_images(
        images, plan, spacing=spacing, kernel_exceptions=gpt_exceptions
    )

    def _bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "src_base": batch["outname"],
                "band": pa.array([f"Gamma0_{polarization}"] * n, type=pa.string()),
                "data": batch["bytes"],
                "rows": batch["h"].cast(pa.int64()),
                "cols": batch["w"].cast(pa.int64()),
                "ulx": pa.array([ulx] * n, type=pa.float64()),
                "uly": pa.array([uly] * n, type=pa.float64()),
                "xres": pa.array([xres] * n, type=pa.float64()),
                "yres": pa.array([yres] * n, type=pa.float64()),
            }
        )

    bands = processed.map_batches(_bands, batch_format="pyarrow")
    rtc = bool(build_kwargs.get("terrain_flattening", True))
    return write_products(bands, outdir, suffix=suffix, rtc=rtc)


class NoisePowerPixels:
    """Actor-pool stage: the noise-power chain (``plan.build_noise_power``,
    reference snap/util.py:706-876) over closed-form DN rasters, projected
    to EXACT integer NESZ pixel rows.

    The validated Plan drives execution — the actor walks its node
    sequence and dispatches a float64-exact kernel per operator, raising
    on any operator the chain should not contain (so a plan-builder
    regression breaks the stage, not just a unit test):

    - ``Read`` / ``Apply-Orbit-File`` / ``TOPSAR-Deburst`` /
      ``BandSelect`` — geolocation/metadata operators, pixels untouched.
    - ``Calibration`` — records the calibration constant A (the LUT);
      applied jointly at the noise node exactly like SNAP resolves the
      calibration vectors when ``outputNoise`` is set.
    - ``ThermalNoiseRemoval(outputNoise=True)`` — the image becomes the
      calibrated noise-equivalent: NE?Z = DN² / A². A = 8 keeps every
      value an exact dyadic rational (DN ≤ 255 ⇒ DN²/64 exact in f64).
    - ``Multilook`` — block mean (exact: /rg·az over dyadic inputs).
    - ``Terrain-Correction`` — the REAL ``warp_affine`` kernel at an
      exactness-preserving configuration: target grid == source grid
      (integer-degree origin, resolution 1/16°), so every bilinear
      weight is exactly {0, 1} and values pass through bit-identical.
    - ``Write(clean_edges=True)`` — 1-px edge erosion (the reference's
      post-gpt writer step), then pixels emit as ``nesz_q`` = NESZ·256,
      an exact int64 (denominator 64·4 = 256 cancels).
    """

    CAL_A = 8.0
    RES = 1.0 / 16.0  # 1/16° — dyadic, divides the integer-degree origin

    def __init__(self, plan):
        if not plan.is_consistent():
            raise ValueError("plan has unresolved source links")
        allowed = {
            "Read", "Apply-Orbit-File", "Calibration", "ThermalNoiseRemoval",
            "TOPSAR-Deburst", "BandSelect", "Multilook", "Terrain-Correction",
            "Write",
        }
        for node in plan:
            if node.operator not in allowed:
                raise NotImplementedError(
                    f"no noise-power kernel for operator {node.operator!r}"
                )
        self.nodes = list(plan.nodes)

    def _run(self, arr: np.ndarray, image_id: int) -> np.ndarray:
        from ..functions.raster import erode_edges, multilook

        for node in self.nodes:
            op, params = node.operator, node.parameters
            if op == "ThermalNoiseRemoval" and params.get("outputNoise"):
                arr = arr * arr / (self.CAL_A * self.CAL_A)
            elif op == "Multilook":
                arr = multilook(arr, int(params.get("rg", 2)), int(params.get("az", 2)))
            elif op == "Terrain-Correction":
                h, w = arr.shape
                ulx = float(image_id % 360 - 180)
                uly = float(image_id % 120 - 60)
                gt = (ulx, self.RES, 0.0, uly, 0.0, -self.RES)
                bounds = (ulx, uly - h * self.RES, ulx + w * self.RES, uly)
                arr, _ = warp_affine(arr, gt, bounds, (self.RES, self.RES))
            elif op == "Write" and params.get("clean_edges"):
                arr = erode_edges(arr[None, ...], pixels=1)[0]
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, ys_out, xs_out, q_out = [], [], [], []
        for img_id, blob, w, h in zip(
            batch["image_id"].to_numpy(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
        ):
            dn = np.frombuffer(blob, dtype=np.uint8).reshape(int(h), int(w))
            arr = self._run(dn.astype(np.float64), int(img_id))
            valid = arr != 0
            yy, xx = np.nonzero(valid)
            q = np.round(arr[valid] * 256.0).astype(np.int64)
            ids_out.append(np.full(len(yy), img_id, dtype=np.int64))
            ys_out.append(yy.astype(np.int64))
            xs_out.append(xx.astype(np.int64))
            q_out.append(q)
        if not ids_out:
            return pa.table(
                {
                    "image_id": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "x": pa.array([], type=pa.int64()),
                    "nesz_q": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "image_id": pa.array(np.concatenate(ids_out)),
                "y": pa.array(np.concatenate(ys_out)),
                "x": pa.array(np.concatenate(xs_out)),
                "nesz_q": pa.array(np.concatenate(q_out)),
            }
        )


def noise_power_pixels(
    images: Dataset, plan, concurrency=(1, 4), batch_size: int = 64
) -> Dataset:
    """The noise-power chain projected to exact NESZ·256 pixel rows."""
    return images.map_batches(
        NoisePowerPixels,
        fn_constructor_args=(plan,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
