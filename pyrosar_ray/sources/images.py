"""Deterministic synthetic image table per BASELINE.json ``input_hint``.

Schema: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). Derived 1:1 from the driver's
``documents`` table so every sf-dir yields the same rows on every run
and on any cluster size: the pixel array is a seeded-PRNG gradient
keyed by the SEED id, captions are the document texts (byte-equality
checked downstream).

Near-dup structure for the dedup stages: ids ending in 9 reuse the
previous id's seed → identical pixels → identical phash (mirrors the
~10% identity-collision rate of the derived scene catalog).

``fmt`` mixes ``raw`` (uncompressed RGB bytes) with ``png`` (seed % 7
== 0, the pure-Python codec in functions/png.py) and baseline ``jpeg``
(seed % 11 == 0, the pure-numpy codec in functions/jpeg.py) so both
the lossless and the lossy compressed-decode paths run for real
end-to-end. Format slices key on the SEED (not the id) so near-dup
partners share a format and stay byte-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data import Dataset

from ..pipelines.tables import read_parquet_clean as _read_parquet

_SIZES = (16, 24, 32)  # small in tests; production rows are MB-scale


def synth_image(seed: int) -> tuple[np.ndarray, int, int]:
    """Deterministic RGB uint8 array for a seed id."""
    w = _SIZES[seed % 3]
    h = _SIZES[seed // 3 % 3]
    rng = np.random.RandomState(seed % (2**31))
    base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint16)
    # dominant low-frequency random field: per-image 8x8 structure so
    # block-mean phashes are decorrelated across seeds (identical seeds
    # still produce identical pixels for the near-dup pairs)
    low = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint16)
    low = np.repeat(np.repeat(low, (h + 7) // 8, axis=0), (w + 7) // 8, axis=1)[:h, :w]
    ramp = (np.arange(w, dtype=np.uint16) * 255 // max(w - 1, 1)).astype(np.uint16)
    arr = ((2 * low + base + ramp[None, :, None]) // 4).astype(np.uint8)
    return arr, w, h


def block_mean_cells(arr: np.ndarray, grid: int = 8) -> np.ndarray:
    """(grid, grid) block-mean luma cells via one integral image."""
    luma = arr.astype(np.float64).mean(axis=2)
    h, w = luma.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    cum = np.zeros((h + 1, w + 1))
    cum[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    sums = (
        cum[ys[1:], :][:, xs[1:]]
        - cum[ys[:-1], :][:, xs[1:]]
        - cum[ys[1:], :][:, xs[:-1]]
        + cum[ys[:-1], :][:, xs[:-1]]
    )
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return sums / areas


def phash_from_cells(cells: np.ndarray) -> int:
    """64-bit average hash from precomputed 8×8 block-mean cells."""
    bits = (cells > cells.mean()).ravel()
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(np.int64((weights[bits].sum(dtype=np.uint64)) >> np.uint64(1)))


def average_phash(arr: np.ndarray, grid: int = 8) -> int:
    """64-bit average hash: 8×8 block-mean luma thresholded at its mean."""
    return phash_from_cells(block_mean_cells(arr, grid))


def read_image_table(path: str) -> Dataset:
    """Read the image+caption table: Lance when available, else Parquet.

    The production format is Lance (BASELINE.json input_hint); this
    container ships no ``lance`` package, so the reader degrades to a
    parquet directory with the identical schema — the pipeline code is
    format-agnostic either way.
    """
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path)
    except ImportError:
        return _read_parquet(path)


def write_image_table(ds: Dataset, path: str) -> None:
    """Write the image table (Lance when available, else Parquet)."""
    try:
        import lance  # noqa: F401

        ds.write_lance(path)
    except (ImportError, AttributeError):
        ds.write_parquet(path)


def images_from_documents(sf_dir: str, with_pixels: bool = True) -> Dataset:
    """The synthetic image+caption Dataset (one row per document).

    ``with_pixels=False`` is the metadata-only projection: image_id /
    w / h / fmt / caption are closed-form in the id, so pipelines that
    drop the payload (curation gates, shard layout) skip the blob
    encode entirely — the column-pruning analogue for a GENERATED
    source, mirroring how a Lance read would push the column list down.
    """
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    if not with_pixels:

        def _meta(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            seeds = np.where(ids % 10 == 9, ids - 1, ids)
            sizes = np.asarray(_SIZES, dtype=np.int32)
            w = sizes[seeds % 3]
            h = sizes[seeds // 3 % 3]
            fmt = np.where(
                seeds % 7 == 0,
                "png",
                np.where(
                    seeds % 11 == 0,
                    "jpeg",
                    np.where(
                        seeds % 13 == 0,
                        "gif",
                        np.where(seeds % 17 == 0, "qoi", "raw"),
                    ),
                ),
            ).astype(object)
            image_ids = np.array([f"img-{i:012d}" for i in ids], dtype=object)
            return pa.table(
                {
                    "image_id": pa.array(image_ids, pa.string()),
                    "w": pa.array(w),
                    "h": pa.array(h),
                    "fmt": pa.array(fmt, pa.string()),
                    "caption": batch["text"],
                }
            )

        return docs.map_batches(_meta, batch_format="pyarrow")

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        blobs, ws, hs, fmts, phashes, image_ids = [], [], [], [], [], []
        for i, t in zip(ids.tolist(), texts):
            seed = i - 1 if i % 10 == 9 else i  # near-dup pairs
            arr, w, h = synth_image(seed)
            # format slices are keyed on the SEED so near-dup partners
            # share a format → byte-identical blobs → hamming-0 pairs
            # survive lossy jpeg (png first, then jpeg, else raw)
            if seed % 7 == 0:  # lossless compressed slice
                from ..functions.png import encode_png

                blobs.append(encode_png(arr))
                fmts.append("png")
            elif seed % 11 == 0:  # lossy compressed slice (jpeg)
                from ..functions.jpeg import (
                    decode_jpeg,
                    encode_jpeg,
                    encode_jpeg_progressive,
                )

                # half the slice is progressive (SOF2), keyed on the
                # SEED so near-dup partners keep byte-identical blobs;
                # fmt stays 'jpeg' — downstream dispatch is container-
                # driven, exactly like real mixed-layout corpora
                enc = encode_jpeg_progressive if (seed // 11) % 2 == 0 else encode_jpeg
                blob = enc(arr, quality=98)
                blobs.append(blob)
                fmts.append("jpeg")
                # phash describes the STORED image: recompute from the
                # decoded pixels so decode→rehash is exact downstream
                arr = decode_jpeg(blob)
            elif seed % 13 == 0:  # palettized slice (gif)
                from ..functions.gif import decode_gif, encode_gif

                # GIF is palette-bound: posterize to 4 levels/channel
                # (≤ 64 colors) — the deterministic stand-in for a real
                # pipeline's quantizer; phash reflects the STORED image
                arr = ((arr // 64) * 64 + 32).astype(np.uint8)
                blob = encode_gif(arr)
                blobs.append(blob)
                fmts.append("gif")
                arr = decode_gif(blob)  # lossless here; keeps the contract
            elif seed % 17 == 0:  # modern-lossless slice (qoi)
                from ..functions.qoi import encode_qoi

                blobs.append(encode_qoi(arr))
                fmts.append("qoi")
            else:
                blobs.append(arr.tobytes())
                fmts.append("raw")
            ws.append(w)
            hs.append(h)
            phashes.append(average_phash(arr))
            image_ids.append(f"img-{i:012d}")
        return pa.table(
            {
                "image_id": pa.array(image_ids, type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
                "fmt": pa.array(fmts, type=pa.string()),
                "caption": pa.array(texts, type=pa.string()),
                "phash": pa.array(phashes, type=pa.int64()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow")


VIDEO_W, VIDEO_H = 8, 6
VIDEO_FPS = (30, 25, 15, 10)


def synth_mp4(doc_id: int) -> bytes:
    """Deterministic MP4 container for an id: ``4 + id % 7`` raw RGB
    frames (8×6), frame f filled with ``(id·31 + f) % 251``, fps keyed
    ``id % 4``, 3 samples per chunk — so the last chunk is short
    whenever ``n % 3 != 0``, forcing the two-entry stsc form."""
    from ..functions.mp4 import encode_mp4

    n = 4 + doc_id % 7
    frames = [
        np.full(VIDEO_W * VIDEO_H * 3, (doc_id * 31 + f) % 251, dtype=np.uint8).tobytes()
        for f in range(n)
    ]
    return encode_mp4(frames, VIDEO_W, VIDEO_H, VIDEO_FPS[doc_id % 4])


def mp4_videos_from_documents(sf_dir: str) -> Dataset:
    """One synthetic MP4 row per document (image_id, bytes, fmt='mp4',
    caption) — the real-container twin of the rawvideo rows."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "image_id": pa.array([f"mp4-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array([synth_mp4(i) for i in ids], type=pa.binary()),
                "w": pa.array([VIDEO_W] * len(ids), type=pa.int32()),
                "h": pa.array([VIDEO_H] * len(ids), type=pa.int32()),
                "fmt": pa.array(["mp4"] * len(ids), type=pa.string()),
                "caption": batch["text"],
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=64)


FOOT_W, FOOT_H = 32, 24


def synth_footprint_raster(doc_id: int) -> bytes:
    """Deterministic grayscale raster whose valid region is a trapezoid
    with integer-arithmetic edges (north_star raster→vector surface):
    pixel (x, y) is valid iff
    ``a + (b·y)//4 <= x <= W-1 - c - (d·y)//4`` with a=id%4, b=id%3,
    c=(id//2)%3, d=(id//3)%2 — recomputable in SQL, so the extraction
    stage's output is hash-checkable while the stage itself reads only
    the pixels."""
    a, b = doc_id % 4, doc_id % 3
    c, d = (doc_id // 2) % 3, (doc_id // 3) % 2
    y = np.arange(FOOT_H)[:, None]
    x = np.arange(FOOT_W)[None, :]
    left = a + (b * y) // 4
    right = FOOT_W - 1 - c - (d * y) // 4
    mask = (x >= left) & (x <= right)
    return (mask * np.uint8(100)).astype(np.uint8).tobytes()


def footprint_rasters_from_documents(sf_dir: str) -> Dataset:
    """One synthetic single-band raster row per document."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "image_id": pa.array([f"fp-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array(
                    [synth_footprint_raster(i) for i in ids], type=pa.binary()
                ),
                "w": pa.array([FOOT_W] * len(ids), type=pa.int32()),
                "h": pa.array([FOOT_H] * len(ids), type=pa.int32()),
                "fmt": pa.array(["raw_gray"] * len(ids), type=pa.string()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def synth_patch_raster(doc_id: int) -> tuple[bytes, int, int]:
    """Deterministic grayscale raster with a CLOSED-FORM pixel fill
    ``v(y, x) = (id*7 + y*13 + x*5) % 251`` — recomputable in SQL, so
    the ViT-style patch-extraction stage's per-patch statistics are
    hash-checkable end to end while the stage reads only the bytes.
    Ragged sizes (w = 8 + id%9, h = 6 + id%7) exercise the edge-crop
    contract (trailing partial patches are dropped)."""
    w, h = 8 + doc_id % 9, 6 + doc_id % 7
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    v = (doc_id * 7 + y * 13 + x * 5) % 251
    return v.astype(np.uint8).tobytes(), w, h


def process_rasters_from_documents(sf_dir: str) -> Dataset:
    """One closed-form RGB raster row per document (process-chain ops).

    Fill ``v(y, x, c) = 1 + (id*7 + y*13 + x*5 + c*29) % 251`` — strictly
    positive so the dB conversion has no nodata holes and erosion only
    removes the border ring; even sizes so multilook(2, 2) crops nothing.
    Every pixel is SQL-recomputable (the image_patches precedent), which
    is what lets the process chain's output hash against the oracle.
    """
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs, ws, hs = [], [], []
        for i in ids:
            w = 16 + (i % 9) * 2
            h = 12 + (i % 7) * 2
            y, x, c = np.ogrid[:h, :w, :3]
            arr = (1 + (i * 7 + y * 13 + x * 5 + c * 29) % 251).astype(np.uint8)
            blobs.append(arr.tobytes())
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.int64()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
                "fmt": pa.array(["raw"] * len(ids), type=pa.string()),
                "caption": pa.array([""] * len(ids), type=pa.string()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def codec_images_from_documents(sf_dir: str, neardup: bool = False) -> Dataset:
    """One closed-form RGB image per document through a LOSSLESS codec
    mix (png / qoi / gif / raw by ``id % 4``), sizes multiples of 8.

    Fill ``v(y, x, c) = (id*7 + y*13 + x*5 + c*29) % 256``; gif rows are
    posterized to 4 levels/channel BEFORE encode (palette bound), a
    transform SQL recomputes, so for every row the decoded pixels equal
    a closed form the oracle can re-derive — the property that lets the
    whole decode → feature path hash against DuckDB (jpeg is excluded
    here by lossiness; its decode is pinned by the codec goldens and
    the progressive/baseline identity tests instead).

    ``neardup=True`` seeds geometry + fill from ``id - 1`` on every
    ``id % 10 == 9`` row (the images_from_documents pairing), while the
    codec still routes on the RAW id — pair members may land different
    codecs, and a gif member's posterize drifts its pixels, so the
    corpus carries both hamming-0 twins and genuine NEAR duplicates."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _make(batch: pa.Table) -> pa.Table:
        from ..functions.gif import encode_gif
        from ..functions.png import encode_png
        from ..functions.qoi import encode_qoi

        ids = batch["doc_id"].to_pylist()
        blobs, ws, hs, fmts = [], [], [], []
        for i in ids:
            seed = i - 1 if (neardup and i % 10 == 9) else i
            w = 16 + (seed % 3) * 8
            h = 8 + (seed // 3 % 3) * 8
            y, x, c = np.ogrid[:h, :w, :3]
            arr = ((seed * 7 + y * 13 + x * 5 + c * 29) % 256).astype(np.uint8)
            r = i % 4
            if r == 0:
                blobs.append(encode_png(arr))
                fmts.append("png")
            elif r == 1:
                blobs.append(encode_qoi(arr))
                fmts.append("qoi")
            elif r == 2:
                arr = ((arr // 64) * 64 + 32).astype(np.uint8)
                blobs.append(encode_gif(arr))
                fmts.append("gif")
            else:
                blobs.append(arr.tobytes())
                fmts.append("raw")
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.int64()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
                "fmt": pa.array(fmts, type=pa.string()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def patch_images_from_documents(sf_dir: str) -> Dataset:
    """One closed-form grayscale raster row per document (patch ops)."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs, ws, hs = [], [], []
        for i in ids:
            b, w, h = synth_patch_raster(i)
            blobs.append(b)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.int64()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
                "fmt": pa.array(["raw_gray"] * len(ids), type=pa.string()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def noise_rasters_from_documents(sf_dir: str) -> Dataset:
    """One closed-form single-band DN raster per document for the
    noise-power chain (``pipelines.geocode.NoisePowerPixels``).

    Fill ``n(y, x) = 1 + (id*11 + y*3 + x*7) % 199`` — strictly positive
    so the NE?Z image has no nodata holes and edge erosion only removes
    the border ring; even sizes so multilook(2, 2) crops nothing. Every
    DN is SQL-recomputable, and with calibration constant A = 8 the
    whole chain stays exact dyadic (DN² / 64, block mean / 4), so the
    emitted NESZ·256 quantization is a pure integer the oracle rebuilds.
    """
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs, ws, hs = [], [], []
        for i in ids:
            w = 16 + (i % 9) * 2
            h = 12 + (i % 7) * 2
            y = np.arange(h, dtype=np.int64)[:, None]
            x = np.arange(w, dtype=np.int64)[None, :]
            dn = (1 + (i * 11 + y * 3 + x * 7) % 199).astype(np.uint8)
            blobs.append(dn.tobytes())
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.int64()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)
