"""Image compute stages: decode, feature-extract, resize, phash near-dup.

The engine's raster core (reference shape: removeGRDBorderNoise /
erode_edges — decode bytes → vectorized numpy → re-encode,
S1/auxil.py:695-858, snap/auxil.py:1457-1587) expressed as actor-pool
``map_batches`` over the binary ``bytes`` column. Memory rule for
MB-scale rows: small ``batch_size`` (payload × batch × concurrency must
fit the worker heap), zero-copy Arrow in, plain numpy per row inside.

``fmt='raw'`` rows decode via ``np.frombuffer``; ``fmt='png'`` rows
decode through the pure-Python codec in functions/png.py. Only jpeg
remains stubbed behind a try-import (no codec lib in this container).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..sources.images import average_phash

from . import table_from_pandas


def decode_image(blob: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes → (h, w, 3) uint8. raw, png (full color-type table), jpeg
    (baseline + progressive) and gif decode natively."""
    if fmt == "raw":
        return np.frombuffer(blob, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "png":
        from ..functions.png import decode_png

        arr = decode_png(blob)
        if arr.dtype == np.uint16:
            arr = (arr >> 8).astype(np.uint8)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr[:, :, :3]
    if fmt in ("jpeg", "jpg"):
        from ..functions.jpeg import decode_jpeg

        arr = decode_jpeg(blob)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    if fmt == "gif":
        from ..functions.gif import decode_gif

        return decode_gif(blob)
    if fmt == "qoi":
        from ..functions.qoi import decode_qoi

        arr = decode_qoi(blob)
        return arr[:, :, :3]
    if fmt in ("tiff", "tif"):
        from ..functions.tiff import decode_geotiff

        arr = np.moveaxis(decode_geotiff(blob)["data"], 0, 2)
        if arr.dtype != np.uint8:  # image use: clip numeric bands to 8-bit
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        if arr.shape[2] == 1:
            return np.repeat(arr, 3, axis=2)
        return arr[:, :, :3]
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    except ImportError as err:  # pragma: no cover
        raise NotImplementedError(
            f"decode of fmt={fmt!r} requires an imaging library (PIL/opencv); "
            "raw, png, jpeg and gif decode natively in this sandbox"
        ) from err


def block_mean_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample via integral image (exact block means)."""
    luma = arr.astype(np.float64)
    h, w = luma.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    cum = np.zeros((h + 1, w + 1, luma.shape[2]))
    cum[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    sums = (
        cum[ys[1:], :][:, xs[1:]]
        - cum[ys[:-1], :][:, xs[1:]]
        - cum[ys[1:], :][:, xs[:-1]]
        + cum[ys[:-1], :][:, xs[:-1]]
    )
    areas = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :])[:, :, None]
    return (sums / areas).round().astype(np.uint8)


class ImageFeatures:
    """Actor-pool stage: decode → stats + thumbnail + recomputed phash.

    Stateful setup (the thumbnail geometry) happens once per actor; each
    __call__ handles one Arrow batch. Output keeps ``caption``
    unchanged — the per-row caption byte-equality invariant.

    ``on_error='skip'`` is the corpus-scale policy (the reference's
    ``identify`` swallow-failures contract, drivers.py:69-120): a
    corrupt blob drops its ROW instead of killing the task→retry→job
    chain, and every skip is counted on the cluster-wide metrics
    collector under ``image_features/corrupt_rows``. The default stays
    strict — correctness gates must not mask decode bugs as skips.
    """

    def __init__(self, thumb: int = 8, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip'")
        self.thumb = thumb
        self.skip = on_error == "skip"
        self.collector = None
        if self.skip:
            from ..state.metrics import get_collector

            self.collector = get_collector()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        means, stds, phashes, thumbs, keep = [], [], [], [], []
        n_bad = 0
        for i, (blob, w, h, fmt) in enumerate(zip(blobs, ws, hs, fmts)):
            try:
                arr = decode_image(blob, int(w), int(h), fmt)
            except Exception:
                if not self.skip:
                    raise
                n_bad += 1
                continue
            keep.append(i)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            phashes.append(average_phash(arr))
            thumbs.append(block_mean_resize(arr, self.thumb, self.thumb).tobytes())
        if n_bad and self.collector is not None:
            self.collector.add.remote("image_features", "corrupt_rows", float(n_bad))
        base = batch if not self.skip else batch.take(keep)
        return pa.table(
            {
                "image_id": base["image_id"],
                "caption": base["caption"],
                "mean_px": pa.array(means, type=pa.float64()),
                "std_px": pa.array(stds, type=pa.float64()),
                "phash": pa.array(phashes, type=pa.int64()),
                "thumbnail": pa.array(thumbs, type=pa.binary()),
            }
        )


def image_features(
    images: Dataset,
    concurrency=(2, 8),
    batch_size: int = 64,
    on_error: str = "raise",
) -> Dataset:
    """Run the decode/feature stage as an actor pool (setup once per actor).

    Pool ceiling 8: the mixed-codec decode (progressive JPEG at ~1.7×
    baseline cost, GIF LZW, QOI) is pure-Python/numpy per image, so the
    stage scales with actors until the upstream source tasks dominate
    (measured flat 4→12 actors at sf0.1 on 32 CPUs)."""
    return images.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"on_error": on_error},
    )


class ImageProcessChain:
    """Actor-pool geocode-style chain: decode → multilook → dB → erode → encode.

    The engine analogue of the reference's SNAP workflow node chain
    (snap/util.py:28-703: Calibration → Multilook → ... → LinearToFromdB
    → Write), collapsed into ONE actor stage so intermediates never
    leave the worker (the reference's .dim intermediates become local
    arrays; Ray object store only carries the final product).
    """

    def __init__(self, looks: tuple[int, int] = (2, 2), erode_px: int = 1):
        self.looks = looks
        self.erode_px = erode_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.raster import erode_edges, linear_to_db, multilook

        out_bytes, out_w, out_h, out_mean = [], [], [], []
        for blob, w, h, fmt in zip(
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
            batch["fmt"].to_pylist(),
        ):
            arr = decode_image(blob, int(w), int(h), fmt).astype(np.float64)
            ml = multilook(arr, *self.looks)
            db = linear_to_db(ml.mean(axis=2) + 1.0)  # +1: keep zeros valid
            masked = erode_edges(db[None, ...], pixels=self.erode_px)[0]
            out_bytes.append(masked.astype(np.float32).tobytes())
            out_h.append(masked.shape[0])
            out_w.append(masked.shape[1])
            out_mean.append(float(masked.mean()))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "caption": batch["caption"],
                "bytes": pa.array(out_bytes, type=pa.binary()),
                "w": pa.array(np.asarray(out_w, dtype=np.int32)),
                "h": pa.array(np.asarray(out_h, dtype=np.int32)),
                "fmt": pa.array(["f32"] * len(out_bytes), type=pa.string()),
                "mean_db": pa.array(out_mean, type=pa.float64()),
            }
        )


def process_images(images: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return images.map_batches(
        ImageProcessChain,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class ProcessChainPixels:
    """The ImageProcessChain through the SAME kernels (decode →
    multilook → linear_to_db → erode_edges), emitting the masked dB
    raster as exact micro-dB integer pixel rows instead of an f32 blob
    — the oracle-hashable projection (an f32 re-encode truncates below
    the 1e-6 quantum; quantizing the float64 array keeps every pixel
    bit-reproducible in SQL, see __ray_entry__._process_sql)."""

    def __init__(self, looks: tuple[int, int] = (2, 2), erode_px: int = 1):
        self.looks = looks
        self.erode_px = erode_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.raster import erode_edges, linear_to_db, multilook

        ids_out, ys_out, xs_out, dbu_out = [], [], [], []
        for img_id, blob, w, h, fmt in zip(
            batch["image_id"].to_numpy(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
            batch["fmt"].to_pylist(),
        ):
            arr = decode_image(blob, int(w), int(h), fmt).astype(np.float64)
            ml = multilook(arr, *self.looks)
            db = linear_to_db(ml.mean(axis=2) + 1.0)
            masked = erode_edges(db[None, ...], pixels=self.erode_px)[0]
            valid = masked != 0
            yy, xx = np.nonzero(valid)
            dbu = np.floor(masked[valid] * 1e6 + 0.5).astype(np.int64)
            ids_out.append(np.full(len(yy), img_id, dtype=np.int64))
            ys_out.append(yy.astype(np.int64))
            xs_out.append(xx.astype(np.int64))
            dbu_out.append(dbu)
        if not ids_out:
            return pa.table(
                {
                    "image_id": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "x": pa.array([], type=pa.int64()),
                    "db_u": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "image_id": pa.array(np.concatenate(ids_out)),
                "y": pa.array(np.concatenate(ys_out)),
                "x": pa.array(np.concatenate(xs_out)),
                "db_u": pa.array(np.concatenate(dbu_out)),
            }
        )


class ImageStatsExact:
    """Actor-pool decode → INTEGER-EXACT per-image features.

    The oracle-hashable projection of the ImageFeatures stage: same
    decode dispatch, but every statistic is exact integer arithmetic —
    pixel sum / min / max, a position-weighted checksum (catches pixel
    permutation and channel-order bugs a plain sum cannot), and an
    average-hash whose block-vs-mean compare is the cross-multiplied
    ``cell_sum * 64 > total_sum`` (no float division anywhere; sizes
    are multiples of 8 so the 64 blocks have equal areas). Split into
    (phash_hi, phash_lo) int64 halves so no 2^63 bit overflows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        sums = np.empty(n, dtype=np.int64)
        mins = np.empty(n, dtype=np.int64)
        maxs = np.empty(n, dtype=np.int64)
        checks = np.empty(n, dtype=np.int64)
        ph_lo = np.empty(n, dtype=np.int64)
        ph_hi = np.empty(n, dtype=np.int64)
        for i, (blob, w, h, fmt) in enumerate(
            zip(
                batch["bytes"].to_pylist(),
                batch["w"].to_numpy(),
                batch["h"].to_numpy(),
                batch["fmt"].to_pylist(),
            )
        ):
            arr = decode_image(blob, int(w), int(h), fmt).astype(np.int64)
            sums[i] = arr.sum()
            mins[i] = arr.min()
            maxs[i] = arr.max()
            hh, ww, _ = arr.shape
            weights = (
                (np.arange(hh)[:, None, None] * ww + np.arange(ww)[None, :, None])
                * 3
                + np.arange(3)[None, None, :]
                + 1
            )
            checks[i] = int((arr * weights).sum())
            luma = arr.sum(axis=2)  # channel sum: exact "3x luma"
            by, bx = hh // 8, ww // 8
            cells = luma.reshape(8, by, 8, bx).sum(axis=(1, 3))  # int sums
            bits = (cells * 64 > luma.sum()).ravel()
            idx = np.arange(64)
            ph_lo[i] = int(bits[idx < 32] @ (1 << idx[:32].astype(np.int64)))
            ph_hi[i] = int(bits[idx >= 32] @ (1 << idx[:32].astype(np.int64)))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "w": pa.compute.cast(batch["w"], pa.int64()),
                "h": pa.compute.cast(batch["h"], pa.int64()),
                "pix_sum": pa.array(sums),
                "pix_min": pa.array(mins),
                "pix_max": pa.array(maxs),
                "checksum": pa.array(checks),
                "phash_lo": pa.array(ph_lo),
                "phash_hi": pa.array(ph_hi),
            }
        )


def image_stats_exact(images: Dataset, concurrency=(2, 8), batch_size: int = 64) -> Dataset:
    """Decode + integer-exact feature extraction as an actor pool."""
    return images.map_batches(
        ImageStatsExact,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def process_pixels(images: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    """The process chain projected to exact micro-dB pixel rows."""
    return images.map_batches(
        ProcessChainPixels,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class BorderNoiseRemoval:
    """Actor-pool stage: the removeGRDBorderNoise semantics per image row.

    Reference core (S1/auxil.py:695-858): expand a sparse noise LUT to
    the image grid (2-pass linear interp), compute the denoise mask
    ``I² − noise·k ≥ 0.5 AND I ≥ 30``, simplify the detected border line
    (VW + re-insertion) and zero everything outside it. Here the sparse
    LUT rides along as deterministic per-image metadata (seeded from the
    image id); on real S1 data it comes from the calibration annex.
    """

    def __init__(self, lut_points: int = 5, maxpoints: int = 20):
        self.lut_points = lut_points
        self.maxpoints = maxpoints

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.raster import border_noise_mask, interp_lut_2d
        from ..functions.simplify import reduce_line

        out_bytes, out_valid = [], []
        for image_id, blob, w, h, fmt in zip(
            batch["image_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
            batch["fmt"].to_pylist(),
        ):
            arr = decode_image(blob, int(w), int(h), fmt)
            luma = arr.astype(np.float64).mean(axis=2)
            # deterministic sparse LUT: stronger noise toward the left edge
            seed = int(image_id.rsplit("-", 1)[-1])
            rng = np.random.RandomState(seed % (2**31))
            rows = np.linspace(0, int(h) - 1, self.lut_points)
            cols = np.linspace(0, int(w) - 1, self.lut_points)
            base = rng.uniform(0, 40, size=(self.lut_points, self.lut_points))
            base[:, 0] += 200.0  # left-edge border noise
            noise = interp_lut_2d(rows, cols, base**2, int(h), int(w))
            mask = border_noise_mask(luma, noise)
            # border line: first valid column per row → VW-simplified
            first_valid = np.argmax(mask, axis=1).astype(np.float64)
            line = reduce_line(
                np.arange(int(h), dtype=np.float64), first_valid, self.maxpoints
            )
            # zero every pixel left of the simplified border
            cut = np.interp(np.arange(int(h)), line[:, 0], line[:, 1])
            keep = np.arange(int(w))[None, :] >= np.floor(cut)[:, None]
            cleaned = np.where(keep[:, :, None], arr, 0).astype(np.uint8)
            out_bytes.append(cleaned.tobytes())
            out_valid.append(float(keep.mean()))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "caption": batch["caption"],
                "bytes": pa.array(out_bytes, type=pa.binary()),
                "w": batch["w"],
                "h": batch["h"],
                "fmt": batch["fmt"],
                "valid_fraction": pa.array(out_valid, type=pa.float64()),
            }
        )


def remove_border_noise(images: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return images.map_batches(
        BorderNoiseRemoval,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class FrameSampler:
    """Actor-pool stage: sample every k-th frame of a raw video column.

    Multimodal plumbing for video rows: ``bytes`` holds ``n_frames``
    concatenated raw RGB frames of (h, w); the stage slices frame views
    zero-copy from the buffer, keeps every ``step``-th frame, and emits
    one OUTPUT ROW PER KEPT FRAME (flat_map shape). Compressed codecs
    (mp4 etc.) would decode here behind the same signature — that path
    is stubbed like compressed images (no codec libs in this sandbox).
    """

    def __init__(self, step: int = 2):
        self.step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, blobs, caps = [], [], [], []
        for vid, blob, w, h, fmt, cap in zip(
            batch["image_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
            batch["fmt"].to_pylist(),
            batch["caption"].to_pylist(),
        ):
            if fmt == "mp4":
                from ..functions.mp4 import parse_mp4

                info = parse_mp4(blob)
                if info["codec"] != "raw ":
                    raise NotImplementedError(
                        f"mp4 sample entry {info['codec']!r} needs a video "
                        "codec library; only 'raw ' frames decode here"
                    )
                off, sz = info["sample_offsets"], info["sample_sizes"]
                for f in range(0, info["n_frames"], self.step):
                    ids.append(vid)
                    frames.append(f)
                    blobs.append(blob[off[f] : off[f] + sz[f]])
                    caps.append(cap)
                continue
            if fmt == "gif":
                from ..functions.gif import gif_frames

                for f, frame in enumerate(gif_frames(blob)):
                    if f % self.step:
                        continue
                    ids.append(vid)
                    frames.append(f)
                    blobs.append(np.ascontiguousarray(frame).tobytes())
                    caps.append(cap)
                continue
            if fmt != "rawvideo":
                raise NotImplementedError(
                    f"frame sampling of fmt={fmt!r} requires a video codec; "
                    "fmt='rawvideo', fmt='mp4' (raw sample entries) and "
                    "fmt='gif' (animated) decode in this sandbox"
                )
            frame_bytes = int(w) * int(h) * 3
            n = len(blob) // frame_bytes
            arr = np.frombuffer(blob[: n * frame_bytes], dtype=np.uint8)
            for f in range(0, n, self.step):
                ids.append(vid)
                frames.append(f)
                blobs.append(arr[f * frame_bytes : (f + 1) * frame_bytes].tobytes())
                caps.append(cap)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "frame": pa.array(frames, type=pa.int32()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "caption": pa.array(caps, type=pa.string()),
            }
        )


class Mp4Meta:
    """Actor-pool stage: real ISO-BMFF parse over an mp4 binary column.

    Walks the box tree, resolves the stts/stsc/stsz/stco sample tables
    and extracts + checksums the first sample payload — so box sizing,
    chunk-run expansion and offset resolution are all hash-checkable
    against an arithmetic SQL twin (functions/mp4.py).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mp4 import parse_mp4

        cols = {k: [] for k in (
            "w", "h", "codec", "n_frames", "n_chunks", "fps",
            "duration_ms", "frame0_sum",
        )}
        for blob in batch["bytes"].to_pylist():
            info = parse_mp4(blob)
            cols["w"].append(info["w"])
            cols["h"].append(info["h"])
            cols["codec"].append(info["codec"])
            cols["n_frames"].append(info["n_frames"])
            cols["n_chunks"].append(info["n_chunks"])
            cols["fps"].append(info["fps"])
            cols["duration_ms"].append(info["duration_ms"])
            o, s = info["sample_offsets"][0], info["sample_sizes"][0]
            cols["frame0_sum"].append(
                int(np.frombuffer(blob[o : o + s], dtype=np.uint8).sum())
            )
        return pa.table(
            {
                "image_id": batch["image_id"],
                "w": pa.array(cols["w"], type=pa.int64()),
                "h": pa.array(cols["h"], type=pa.int64()),
                "codec": pa.array(cols["codec"], type=pa.string()),
                "n_frames": pa.array(cols["n_frames"], type=pa.int64()),
                "n_chunks": pa.array(cols["n_chunks"], type=pa.int64()),
                "fps": pa.array(cols["fps"], type=pa.int64()),
                "duration_ms": pa.array(cols["duration_ms"], type=pa.float64()),
                "frame0_sum": pa.array(cols["frame0_sum"], type=pa.int64()),
            }
        )


def mp4_meta(videos: Dataset, concurrency=(1, 4), batch_size: int = 32) -> Dataset:
    """Container-level MP4 metadata via the real box-tree parser."""
    return videos.map_batches(
        Mp4Meta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def sample_frames(videos: Dataset, step: int = 2, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    """Per-video frame sampling (small batch_size: video rows are large)."""
    return videos.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_args=(step,),
    )


def mosaic_tiles(
    tiled_thumbs: Dataset, tile_col: str = "tile", thumb: int = 8
) -> Dataset:
    """Per-tile mosaic: stitch member thumbnails into one tile image.

    Engine twin of the reference's groupby-mosaic compose
    (gamma/util.py:899-917 MLI_cat, auxdata.py:531-604 VRT mosaic):
    group on the tile key, deterministic member order (image_id), stitch
    along x. Input rows: (tile, image_id, thumbnail bytes of
    ``thumb×thumb×3``).
    """

    def _stitch(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("image_id", kind="mergesort")
        arrs = [
            np.frombuffer(b, dtype=np.uint8).reshape(thumb, thumb, 3)
            for b in group["thumbnail"]
        ]
        stitched = np.concatenate(arrs, axis=1)
        return pd.DataFrame(
            {
                tile_col: [group[tile_col].iloc[0]],
                "n_members": [len(arrs)],
                "mosaic": [stitched.tobytes()],
                "mosaic_w": [stitched.shape[1]],
            }
        )

    return tiled_thumbs.groupby(tile_col).map_groups(_stitch, batch_format="pandas")


# --------------------------------------------------------- phash near-dup


def phash_bands(ds: Dataset, bands: int = 4, id_col: str = "image_id") -> Dataset:
    """Emit one (band, band_key, id, phash) row per 16-bit phash band."""

    def _bands(batch: pa.Table) -> pa.Table:
        ph = batch[id_col], batch["phash"].to_numpy().astype(np.uint64)
        ids, phash = ph
        n = len(batch)
        out_id = []
        out_band = np.empty(n * bands, dtype=np.int32)
        out_key = np.empty(n * bands, dtype=np.int64)
        out_ph = np.empty(n * bands, dtype=np.int64)
        idl = ids.to_pylist()
        for b in range(bands):
            chunk = (phash >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out_band[b * n : (b + 1) * n] = b
            out_key[b * n : (b + 1) * n] = chunk.astype(np.int64)
            out_ph[b * n : (b + 1) * n] = phash.astype(np.int64)
            out_id.extend(idl)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.string()),
                "band": pa.array(out_band),
                "band_key": pa.array(out_key),
                "phash": pa.array(out_ph),
            }
        )

    return ds.map_batches(_bands, batch_format="pyarrow")


def phash_near_dup_pairs(
    ds: Dataset, max_hamming: int = 6, bands: int = 4, id_col: str = "image_id"
) -> Dataset:
    """Near-dup image pairs: same 16-bit band value AND hamming ≤ threshold.

    Banding guarantees recall for hamming ≤ bands-1 misses worst-case
    distributions but catches all pairs with any identical band — the
    standard LSH-for-hamming trade. Verification inside the bucket is
    exact popcount.
    """

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        ph = g["phash"].to_numpy().astype(np.uint64)
        n = len(ids)
        if n > 1:
            # vectorized all-pairs popcount inside the (small) bucket
            ii, jj = np.triu_indices(n, k=1)
            x = ph[ii] ^ ph[jj]
            ham = np.zeros(len(x), dtype=np.int64)
            while True:
                nz = x != 0
                if not nz.any():
                    break
                ham[nz] += 1
                x = x & (x - np.uint64(1))
            keep = ham <= max_hamming
            ii, jj, ham = ii[keep], jj[keep], ham[keep]
        else:
            ii = jj = np.zeros(0, dtype=np.int64)
            ham = np.zeros(0, dtype=np.int64)
        a = np.array(ids, dtype=object)
        id_a = np.minimum(a[ii], a[jj])
        id_b = np.maximum(a[ii], a[jj])
        neq = id_a != id_b  # an id may appear twice in a bucket
        return pd.DataFrame(
            {
                "id_a": pd.Series(id_a[neq], dtype="string"),
                "id_b": pd.Series(id_b[neq], dtype="string"),
                "hamming": pd.Series(ham[neq], dtype="int64"),
            }
        )

    from ray.data.aggregate import Min

    from .dedup_text import DRIVER_COMBINE_MAX_ROWS, keep_multi_member_buckets

    all_band_rows = phash_bands(ds, bands=bands, id_col=id_col).materialize()

    if all_band_rows.count() <= DRIVER_COMBINE_MAX_ROWS:
        # bounded input: the (id, phash, band, band_key) rows fit the
        # driver-combine budget, so the bucket → verify → distinct chain
        # collapses to one pandas pass (two shuffles saved) — the same
        # cost policy as minhash_candidate_pairs' driver fast-path
        import ray
        import ray.data as rd

        refs = all_band_rows.to_arrow_refs()
        blocks = [t for t in ray.get(refs) if len(t)]
        if not blocks:
            df = pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="string"),
                    "id_b": pd.Series([], dtype="string"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
            return rd.from_arrow(
                table_from_pandas(df)
                .replace_schema_metadata(None)
            )
        full = pa.concat_tables(blocks).to_pandas()
        sizes = full.groupby(["band", "band_key"])[id_col].transform("size")
        kept = full[sizes > 1]
        parts = [
            _pairs(g) for _, g in kept.groupby(["band", "band_key"], sort=False)
        ]
        if parts:
            out = (
                pd.concat(parts, ignore_index=True)
                .groupby(["id_a", "id_b"], as_index=False)["hamming"]
                .min()
            )
        else:
            out = pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="string"),
                    "id_b": pd.Series([], dtype="string"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        # strip the pandas-dtype metadata so downstream to_pandas yields
        # plain object string columns (StringDtype is an internal detail)
        return rd.from_arrow(
            table_from_pandas(out)
            .replace_schema_metadata(None)
        )

    from .groups import typed_groups

    band_rows = keep_multi_member_buckets(all_band_rows, ("band", "band_key"))
    # Arrow out at the CALL SITE only (the driver fast-path above reuses
    # the raw pandas UDF): this stage feeds the distinct aggregate, and
    # pandas blocks entering an exchange hit a ~10x slow path
    # (stages/groups.py)
    pairs = band_rows.groupby(["band", "band_key"]).map_groups(
        typed_groups(
            {"id_a": pa.string(), "id_b": pa.string(), "hamming": pa.int64()}
        )(_pairs),
        batch_format="pandas",
    )
    # a pair can surface from several bands → distinct via aggregate
    # (hamming is pair-determined, so Min is the identity); normalize the
    # blocks to Arrow so consumers see plain string columns, not the
    # pandas StringDtype the per-group frames use for schema stability
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )
    return deduped.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def raster_info_columns(
    rasters: Dataset,
    blob_col: str = "blob",
    id_col: str = "image_id",
) -> Dataset:
    """Probe each raster blob's container header → metadata columns.

    The distributed twin of the reference's per-scene ``ID.gdalinfo``
    (pyroSAR/drivers.py:429-477): a stateless ``map_batches`` that reads
    ONLY the container header (TIFF IFD walk / PNG IHDR / ENVI header)
    per row — tile payloads are never decoded, so the stage streams at
    metadata cost regardless of raster size.  Output columns: driver,
    samples, lines, bands, dtype, projection, ulx/uly/xres/yres (NaN for
    ungeoreferenced containers) and nodata.
    """
    from pyrosar_ray.functions.raster_info import raster_info

    def _probe(batch: pa.Table) -> pa.Table:
        blobs = batch[blob_col].to_pylist()
        infos = [raster_info(b) for b in blobs]
        gts = [i["geotransform"] or (np.nan,) * 6 for i in infos]
        return pa.table(
            {
                id_col: batch[id_col],
                "driver": pa.array([i["driver"] for i in infos], type=pa.string()),
                "samples": pa.array([i["samples"] for i in infos], type=pa.int64()),
                "lines": pa.array([i["lines"] for i in infos], type=pa.int64()),
                "bands": pa.array([i["bands"] for i in infos], type=pa.int64()),
                "dtype": pa.array([i["dtype"] for i in infos], type=pa.string()),
                "projection": pa.array(
                    [i["projection"] for i in infos], type=pa.string()
                ),
                "ulx": pa.array([g[0] for g in gts], type=pa.float64()),
                "uly": pa.array([g[3] for g in gts], type=pa.float64()),
                "xres": pa.array([g[1] for g in gts], type=pa.float64()),
                "yres": pa.array([-g[5] for g in gts], type=pa.float64()),
                "nodata": pa.array(
                    [i["nodata"] for i in infos], type=pa.float64()
                ),
            }
        )

    return rasters.map_batches(_probe, batch_format="pyarrow")


def image_patches(
    images: Dataset,
    patch: int = 4,
    id_col: str = "image_id",
) -> Dataset:
    """ViT-style non-overlapping patch extraction (the 2-D analogue of
    :func:`stages.dedup_text.chunk_documents`): each grayscale image is
    cropped to the largest patch-multiple region (trailing partial rows
    and columns DROPPED — the standard vision-transformer contract) and
    exploded into ``patch x patch`` tiles with integer per-patch
    statistics ``(p_sum, p_min, p_max)``.

    Row-local explode — no exchange; output volume = pixel volume /
    patch^2 x 1 row. The per-image reshape/transpose chain is fully
    vectorized (production images are MB-scale, so the per-image Python
    step is negligible against the numpy work; batch memory is bounded
    by ``batch_size`` like every blob stage here).

    Reference surface: per-block raster ops (multilook block-mean,
    snap/auxil.py tiled writer) — same blocking arithmetic, explode
    instead of reduce.
    """
    if patch < 1:
        raise ValueError("patch must be >= 1")

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()
        out_id, out_py, out_px = [], [], []
        out_sum, out_min, out_max = [], [], []
        for i in range(len(ids)):
            w, h = int(ws[i]), int(hs[i])
            wc, hc = w - w % patch, h - h % patch
            if wc == 0 or hc == 0:
                continue
            arr = np.frombuffer(blobs[i], dtype=np.uint8).reshape(h, w)
            tiles = (
                arr[:hc, :wc]
                .reshape(hc // patch, patch, wc // patch, patch)
                .transpose(0, 2, 1, 3)
                .reshape(-1, patch * patch)
                .astype(np.int64)
            )
            n_py, n_px = hc // patch, wc // patch
            out_id.append(np.full(n_py * n_px, ids[i], dtype=np.int64))
            out_py.append(np.repeat(np.arange(n_py, dtype=np.int64), n_px))
            out_px.append(np.tile(np.arange(n_px, dtype=np.int64), n_py))
            out_sum.append(tiles.sum(axis=1))
            out_min.append(tiles.min(axis=1))
            out_max.append(tiles.max(axis=1))
        if not out_id:
            e = pa.array([], type=pa.int64())
            return pa.table(
                {id_col: e, "py": e, "px": e, "p_sum": e, "p_min": e, "p_max": e}
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "py": pa.array(np.concatenate(out_py)),
                "px": pa.array(np.concatenate(out_px)),
                "p_sum": pa.array(np.concatenate(out_sum)),
                "p_min": pa.array(np.concatenate(out_min)),
                "p_max": pa.array(np.concatenate(out_max)),
            }
        )

    return images.map_batches(_explode, batch_format="pyarrow", batch_size=128)


def raster_gradient_stats(
    images: Dataset,
    id_col: str = "image_id",
) -> Dataset:
    """Integer-exact stencil reduction: per-image central-difference
    gradient statistics over the interior pixels.

    The hash-checkable member of the map-algebra stencil family
    (erode_edges / multilook / hillshade share the same neighborhood
    indexing but reduce floats): ``gx = v[y, x+1] - v[y, x-1]``,
    ``gy = v[y+1, x] - v[y-1, x]`` on the (h-2)x(w-2) interior, emitting
    ``grad_sum = sum(|gx| + |gy|)``, ``gx_max``/``gy_max`` and the
    interior pixel count — all int64, so an off-by-one in any of the
    four neighbor offsets breaks the oracle hash.

    Row-local (one vectorized slice-subtract per image); images whose
    interior is empty (w < 3 or h < 3) drop.
    """

    def _stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()
        out = {k: [] for k in (id_col, "grad_sum", "gx_max", "gy_max", "n_interior")}
        for i in range(len(ids)):
            w, h = int(ws[i]), int(hs[i])
            if w < 3 or h < 3:
                continue
            v = (
                np.frombuffer(blobs[i], dtype=np.uint8)
                .reshape(h, w)
                .astype(np.int64)
            )
            gx = v[1:-1, 2:] - v[1:-1, :-2]
            gy = v[2:, 1:-1] - v[:-2, 1:-1]
            out[id_col].append(int(ids[i]))
            out["grad_sum"].append(int(np.abs(gx).sum() + np.abs(gy).sum()))
            out["gx_max"].append(int(np.abs(gx).max()))
            out["gy_max"].append(int(np.abs(gy).max()))
            out["n_interior"].append((h - 2) * (w - 2))
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})

    return images.map_batches(_stats, batch_format="pyarrow", batch_size=128)


#: D8 neighbor table in PRIORITY order (argmax takes the FIRST maximum,
#: so this order IS the tie-break rule — shared verbatim with the SQL
#: twin's CASE chain): E, SE, S, SW, W, NW, N, NE with ESRI power-of-two
#: codes. Slope weights 14 (orthogonal) / 10 (diagonal) are the
#: rational rendering of the 1/√2 distance ratio (10/14 ≈ 1/1.4) — the
#: comparison drop_o/1 vs drop_d/√2 becomes the EXACT integer
#: 14·drop_o vs 10·drop_d under that convention.
D8_DIRS = (
    (1, 0, 1, 14), (1, 1, 2, 10), (0, 1, 4, 14), (-1, 1, 8, 10),
    (-1, 0, 16, 14), (-1, -1, 32, 10), (0, -1, 64, 14), (1, -1, 128, 10),
)


def flow_direction_counts(
    images: Dataset,
    id_col: str = "image_id",
) -> Dataset:
    """Per-image D8 flow-direction histogram — the hydrology primitive
    (O'Callaghan–Mark steepest descent) over the map-algebra stencil
    family's shared neighborhood indexing.

    Each interior pixel flows to the neighbor maximizing the
    distance-weighted drop (integer 14/10 convention, see
    :data:`D8_DIRS`); ties break on the fixed priority order; pixels
    with no positive-score neighbor are pits/flats (code 0). Output:
    ``(id_col, code, n)`` rows — at most 9 per image, so the result is
    image-count bounded. Row-local, zero shuffle; the SQL twin replays
    every drop from the fill formula, so the neighbor offsets, the
    weight convention AND the tie-break order are all hash-checked.
    """

    def _counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()
        out_id, out_code, out_n = [], [], []
        for i in range(len(ids)):
            w, h = int(ws[i]), int(hs[i])
            if w < 3 or h < 3:
                continue
            v = (
                np.frombuffer(blobs[i], dtype=np.uint8)
                .reshape(h, w)
                .astype(np.int64)
            )
            c = v[1:-1, 1:-1]
            scores = np.stack(
                [
                    wgt * (c - v[1 + dy : h - 1 + dy, 1 + dx : w - 1 + dx])
                    for dx, dy, _, wgt in D8_DIRS
                ]
            )
            best = scores.max(axis=0)
            pick = scores.argmax(axis=0)  # first max == priority order
            codes = np.array([code for _, _, code, _ in D8_DIRS])[pick]
            codes = np.where(best <= 0, 0, codes)
            uniq, cnt = np.unique(codes, return_counts=True)
            out_id.extend([int(ids[i])] * len(uniq))
            out_code.extend(uniq.tolist())
            out_n.extend(cnt.tolist())
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "code": pa.array(out_code, type=pa.int64()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    return images.map_batches(_counts, batch_format="pyarrow", batch_size=128)


#: training-style aspect buckets (bw, bh) — prototypes, not pixel sizes.
#: The weight column is lcm(bh)/bh so integer scores compare exactly
#: across buckets (see aspect_bucket_assign).
ASPECT_BUCKETS = ((1, 1), (4, 3), (3, 4), (3, 2), (2, 3), (2, 1), (1, 2))


def aspect_bucket_assign(
    images: Dataset,
    buckets: tuple[tuple[int, int], ...] = ASPECT_BUCKETS,
    id_col: str = "image_id",
) -> Dataset:
    """Aspect-ratio bucketing for training batches (SDXL-style): each
    image is assigned the bucket whose aspect ratio is nearest to w/h.

    The distance |w/h - bw/bh| is ranked integer-exactly: multiplying
    by h (common to all buckets for one image) and by lcm(bh)/bh gives
    score = |w*bh - h*bw| * (L/bh) with L = lcm of bucket heights — an
    int64 whose ordering equals the rational ordering, so the argmin
    (ties to the lowest bucket index, numpy argmin semantics = SQL
    ROW_NUMBER) is reproducible bit-for-bit in the DuckDB twin.

    Row-local map_batches, zero shuffle: at 10^12 rows this is pure
    streaming — the bucket table is a compile-time constant, no
    broadcast needed.
    """
    import math

    bw = np.array([b[0] for b in buckets], dtype=np.int64)
    bh = np.array([b[1] for b in buckets], dtype=np.int64)
    L = math.lcm(*[int(x) for x in bh])
    wgt = L // bh

    def _assign(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy().astype(np.int64)
        h = batch["h"].to_numpy().astype(np.int64)
        # (n, k) integer score matrix; argmin takes the first minimum,
        # matching the twin's ORDER BY score, bucket_id.
        score = np.abs(w[:, None] * bh[None, :] - h[:, None] * bw[None, :]) * wgt[None, :]
        idx = np.argmin(score, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket_id": pa.array(idx.astype(np.int64)),
                "bw": pa.array(bw[idx]),
                "bh": pa.array(bh[idx]),
            }
        )

    return images.map_batches(_assign, batch_format="pyarrow")


def box_downsample_stats(
    images: Dataset,
    factor: int = 2,
    id_col: str = "image_id",
) -> Dataset:
    """Per-image box downsample (sum-pooling), integer-exact: each
    output pixel is the SUM of its ``factor×factor`` input block — the
    exact-arithmetic form of average pooling (the consumer divides by
    ``factor²``; keeping the sum avoids the rounding convention
    entirely). Trailing rows/columns that do not fill a block are
    dropped (the same edge-crop contract as :func:`image_patches`).
    Emitted per image: output dims, the position-weighted sum of the
    downsampled plane (``Σ out[y,x]·(y·w2 + x + 1)`` — pins the block
    layout), and the output min/max. Row-local, zero shuffle; one
    reshape-sum per image.
    """
    f = int(factor)
    if f < 1:
        raise ValueError("factor must be >= 1")

    def _stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()
        out = {
            k: []
            for k in (id_col, "w2", "h2", "ds_wsum", "ds_min", "ds_max")
        }
        for i in range(len(ids)):
            w, h = int(ws[i]), int(hs[i])
            v = np.frombuffer(blobs[i], dtype=np.uint8).astype(np.int64)
            v = v.reshape(h, w)
            h2, w2 = h // f, w // f
            blk = (
                v[: h2 * f, : w2 * f]
                .reshape(h2, f, w2, f)
                .sum(axis=(1, 3))
                if h2 and w2
                else np.zeros((0, 0), dtype=np.int64)
            )
            flat = blk.reshape(-1)
            out[id_col].append(int(ids[i]))
            out["w2"].append(w2)
            out["h2"].append(h2)
            out["ds_wsum"].append(int((flat * (np.arange(flat.size) + 1)).sum()))
            out["ds_min"].append(int(flat.min()) if flat.size else 0)
            out["ds_max"].append(int(flat.max()) if flat.size else 0)
        return pa.table({k: pa.array(c, type=pa.int64()) for k, c in out.items()})

    return images.map_batches(_stats, batch_format="pyarrow", batch_size=128)


def hist_match_stats(
    images: Dataset,
    id_col: str = "image_id",
) -> Dataset:
    """Histogram matching to a FIXED triangular reference — the
    radiometric-normalization op (match every image's tone curve to a
    common reference before mosaicking), integer-exact: the reference
    histogram is ``h_ref[g] = g+1`` (CDF ``(g+1)(g+2)/2`` over
    ``T = 32896``), and the matching LUT is the standard
    ``lut[v] = min{g : CDF_ref(g) ≥ CDF_src(v)}`` evaluated as the
    cross-multiplied integer inequality ``(g+1)(g+2)·npix ≥ 2·cdf·T``
    — no division, no float, so the matched plane is bit-equal to the
    twin. Emitted per image: the position-weighted sum of the matched
    plane, min/max, and the pixel count (the hist_equalize_stats
    contract). Row-local, zero shuffle.
    """
    T2 = 2 * 32896  # 2·Σ(g+1)

    def _stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        blobs = batch["bytes"].to_pylist()
        g = np.arange(256, dtype=np.int64)
        ref_half = (g + 1) * (g + 2)  # 2·CDF_ref(g)
        out = {k: [] for k in (id_col, "hm_wsum", "hm_min", "hm_max", "npix")}
        for i in range(len(ids)):
            v = np.frombuffer(blobs[i], dtype=np.uint8).astype(np.int64)
            npix = len(v)
            cdf = np.cumsum(np.bincount(v, minlength=256))
            # min g with (g+1)(g+2)·npix >= 2·cdf[v]·T  (strictly
            # increasing left side -> one searchsorted per image)
            lut = np.searchsorted(ref_half * npix, cdf * T2, "left")
            hm = lut[v]
            out[id_col].append(int(ids[i]))
            out["hm_wsum"].append(int((hm * (np.arange(npix) + 1)).sum()))
            out["hm_min"].append(int(hm.min()) if npix else 0)
            out["hm_max"].append(int(hm.max()) if npix else 0)
            out["npix"].append(npix)
        return pa.table({k: pa.array(c, type=pa.int64()) for k, c in out.items()})

    return images.map_batches(_stats, batch_format="pyarrow", batch_size=128)


def hist_equalize_stats(
    images: Dataset,
    id_col: str = "image_id",
) -> Dataset:
    """Per-image histogram equalization, integer-exact: the classic
    contrast-stretch LUT ``lut[v] = floor((cdf[v] - cdf_min) * 255 /
    (npix - cdf_min))`` built from the image's OWN 256-bin histogram and
    applied per pixel. Emitted per image: the position-weighted sum of
    the equalized plane (``Σ eq[y,x]·(y·w + x + 1)`` — pins the pixel
    permutation, not just the multiset), the equalized min/max, and the
    pixel count. Constant images (cdf_min == npix) equalize to all
    zeros by convention — shared with the twin. Row-local, zero
    shuffle; bincount + cumsum + one LUT gather per image.
    """

    def _stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()
        out = {k: [] for k in (id_col, "eq_wsum", "eq_min", "eq_max", "npix")}
        for i in range(len(ids)):
            w, h = int(ws[i]), int(hs[i])
            v = np.frombuffer(blobs[i], dtype=np.uint8).astype(np.int64)
            npix = len(v)
            hist = np.bincount(v, minlength=256)
            cdf = np.cumsum(hist)
            nz = np.flatnonzero(hist)
            cdf_min = int(cdf[nz[0]]) if len(nz) else 0
            if npix == cdf_min:
                eq = np.zeros(npix, dtype=np.int64)
            else:
                lut = (cdf - cdf_min) * 255 // (npix - cdf_min)
                eq = lut[v]
            out[id_col].append(int(ids[i]))
            out["eq_wsum"].append(int((eq * (np.arange(npix) + 1)).sum()))
            out["eq_min"].append(int(eq.min()) if npix else 0)
            out["eq_max"].append(int(eq.max()) if npix else 0)
            out["npix"].append(npix)
        return pa.table({k: pa.array(c, type=pa.int64()) for k, c in out.items()})

    return images.map_batches(_stats, batch_format="pyarrow", batch_size=128)
