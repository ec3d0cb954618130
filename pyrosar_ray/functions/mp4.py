"""ISO-BMFF (MP4) container codec, pure numpy/struct.

The video twin of functions/wav.py: real container structure so the
engine's video rows can carry genuine .mp4 files instead of the bare
``rawvideo`` byte convention. Writer emits the classic progressive
layout ``ftyp | mdat | moov`` with a full sample table; reader is a
generic box walker (32-bit sizes, 64-bit largesize, size-0 = to-EOF)
that resolves the stts/stsc/stsz/stco tables into per-sample file
offsets — the part real demuxers get wrong — fully vectorized.

Codec payloads stay opaque: the one sample-entry format implemented is
``raw `` (uncompressed 24-bit RGB), matching the engine's rawvideo
frames; H.264/HEVC payloads parse at the container level (codec fourcc,
sample offsets/sizes extract fine) but frame decode raises, mirroring
the jpeg-progressive / mp3 stance elsewhere.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}

MOVIE_TIMESCALE = 1000
MEDIA_TIMESCALE = 90_000


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def encode_mp4(
    frames: list[bytes],
    w: int,
    h: int,
    fps: int,
    samples_per_chunk: int = 3,
    sync_every: int = 2,
) -> bytes:
    """Frame payloads → a single-video-track MP4.

    ``fps`` must divide the 90 kHz media timescale (10/15/25/30/45/90…).
    Frames are grouped ``samples_per_chunk`` to a chunk (the last chunk
    may be short, which forces the two-entry stsc run-length form);
    every ``sync_every``-th frame (1-based frame 1, 1+s, …) lands in the
    sync-sample table.
    """
    if MEDIA_TIMESCALE % fps:
        raise ValueError(f"fps {fps} must divide {MEDIA_TIMESCALE}")
    n = len(frames)
    delta = MEDIA_TIMESCALE // fps
    sizes = np.array([len(f) for f in frames], dtype=np.int64)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    payload = b"".join(frames)
    mdat = _box(b"mdat", payload)

    # chunk layout: offsets are absolute file offsets into mdat
    n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk
    chunk_first = np.arange(n_chunks) * samples_per_chunk
    csum = np.concatenate([[0], np.cumsum(sizes)])
    mdat_start = len(ftyp) + 8  # mdat header
    chunk_offsets = mdat_start + csum[chunk_first]

    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    last = n - samples_per_chunk * (n_chunks - 1)
    if n_chunks > 1 and last != samples_per_chunk:
        stsc_entries = [(1, samples_per_chunk, 1), (n_chunks, last, 1)]
    else:
        stsc_entries = [(1, min(samples_per_chunk, n), 1)]
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes.tolist()),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", n_chunks)
        + struct.pack(f">{n_chunks}I", *chunk_offsets.tolist()),
    )
    sync = list(range(1, n + 1, sync_every))
    stss = _full(
        b"stss",
        struct.pack(">I", len(sync)) + struct.pack(f">{len(sync)}I", *sync),
    )
    # 'raw ' visual sample entry: 78-byte VisualSampleEntry body
    entry = _box(
        b"raw ",
        struct.pack(">6xH", 1)  # reserved, data_reference_index
        + struct.pack(">HH12x", 0, 0)
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">IH", 0, 1)  # reserved, frame_count
        + b"\x00" * 32  # compressorname (pascal, zeroed)
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)

    url = _full(b"url ", b"", flags=1)  # self-contained
    dref = _full(b"dref", struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)

    media_dur = n * delta
    mdhd = _full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, MEDIA_TIMESCALE, media_dur, 0x55C4, 0)
    )
    hdlr = _full(b"hdlr", struct.pack(">I4s12x", 0, b"vide") + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    movie_dur = media_dur * MOVIE_TIMESCALE // MEDIA_TIMESCALE
    tkhd = _full(
        b"tkhd",
        struct.pack(">III4xI8x", 0, 0, 1, movie_dur)  # times, track 1, duration
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _identity_matrix()
        + struct.pack(">II", w << 16, h << 16),
        flags=3,  # enabled | in movie
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, MOVIE_TIMESCALE, movie_dur)
        + struct.pack(">IH10x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + _identity_matrix()
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _identity_matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + header, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, path: list[bytes]):
    """Resolve a box path like [b'moov', b'trak', ...]; first match wins."""
    if not path:
        return start, end
    for btype, b0, b1 in iter_boxes(buf, start, end):
        if btype == path[0]:
            return _find(buf, b0, b1, path[1:])
    raise ValueError(f"box {b'/'.join(path)!r} not found")


def parse_mp4(blob: bytes) -> dict:
    """Parse an MP4 into track metadata + resolved per-sample offsets.

    Returns brand, codec (stsd fourcc), w, h (tkhd 16.16 → int),
    n_frames, n_chunks, fps (media timescale / stts delta when constant,
    else 0), duration_ms, sample_offsets / sample_sizes (absolute, from
    the stsc/stco/stsz resolution), sync_samples (1-based).
    """
    top = {t: (a, b) for t, a, b in iter_boxes(blob, 0, len(blob))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("not an ISO-BMFF stream (ftyp/moov missing)")
    brand = blob[top[b"ftyp"][0] : top[b"ftyp"][0] + 4].decode("latin-1")

    moov0, moov1 = top[b"moov"]
    info: dict = {"brand": brand}

    mv0, _ = _find(blob, moov0, moov1, [b"mvhd"])
    ver = blob[mv0]
    if ver == 1:
        ts, dur = struct.unpack_from(">IQ", blob, mv0 + 4 + 16)
    else:
        ts, dur = struct.unpack_from(">II", blob, mv0 + 4 + 8)
    info["duration_ms"] = dur * 1000.0 / ts

    tk0, _ = _find(blob, moov0, moov1, [b"trak", b"tkhd"])
    tver = blob[tk0]
    skip = 4 + (32 if tver == 1 else 20) + 8 + 8 + 36
    tw, th = struct.unpack_from(">II", blob, tk0 + skip)
    info["w"], info["h"] = tw >> 16, th >> 16

    md0, _ = _find(blob, moov0, moov1, [b"trak", b"mdia", b"mdhd"])
    mver = blob[md0]
    if mver == 1:
        mts = struct.unpack_from(">I", blob, md0 + 4 + 16)[0]
    else:
        mts = struct.unpack_from(">I", blob, md0 + 4 + 8)[0]

    st0, st1 = _find(blob, moov0, moov1, [b"trak", b"mdia", b"minf", b"stbl"])
    stbl = {t: (a, b) for t, a, b in iter_boxes(blob, st0, st1)}

    sd0 = stbl[b"stsd"][0]
    n_entries = struct.unpack_from(">I", blob, sd0 + 4)[0]
    codec = "none"
    if n_entries:
        codec = blob[sd0 + 12 : sd0 + 16].decode("latin-1")
    info["codec"] = codec

    # stts → per-sample deltas
    tt0 = stbl[b"stts"][0]
    n_tt = struct.unpack_from(">I", blob, tt0 + 4)[0]
    tts = np.frombuffer(blob, dtype=">u4", count=2 * n_tt, offset=tt0 + 8)
    counts, deltas = tts[0::2].astype(np.int64), tts[1::2].astype(np.int64)
    n = int(counts.sum())
    info["n_frames"] = n
    info["fps"] = int(mts // deltas[0]) if len(deltas) and (deltas == deltas[0]).all() else 0

    # stsz
    sz0 = stbl[b"stsz"][0]
    fixed, n_sz = struct.unpack_from(">II", blob, sz0 + 4)
    if fixed:
        sizes = np.full(n_sz, fixed, dtype=np.int64)
    else:
        sizes = np.frombuffer(blob, dtype=">u4", count=n_sz, offset=sz0 + 12).astype(
            np.int64
        )

    # stco (or co64) chunk offsets
    if b"stco" in stbl:
        co0 = stbl[b"stco"][0]
        n_co = struct.unpack_from(">I", blob, co0 + 4)[0]
        offsets = np.frombuffer(blob, dtype=">u4", count=n_co, offset=co0 + 8).astype(
            np.int64
        )
    else:
        co0 = stbl[b"co64"][0]
        n_co = struct.unpack_from(">I", blob, co0 + 4)[0]
        offsets = np.frombuffer(blob, dtype=">u8", count=n_co, offset=co0 + 8).astype(
            np.int64
        )
    info["n_chunks"] = n_co

    # stsc run-length → samples-per-chunk per chunk, then sample offsets
    sc0 = stbl[b"stsc"][0]
    n_sc = struct.unpack_from(">I", blob, sc0 + 4)[0]
    sc = np.frombuffer(blob, dtype=">u4", count=3 * n_sc, offset=sc0 + 8).astype(
        np.int64
    )
    first_chunk, per_chunk = sc[0::3] - 1, sc[1::3]
    run_len = np.diff(np.append(first_chunk, n_co))
    spc = np.repeat(per_chunk, run_len)  # samples per chunk, len n_co
    chunk_of_sample = np.repeat(np.arange(n_co), spc)[:n_sz]
    # offset within chunk: cumulative sizes minus each chunk's base
    csum = np.concatenate([[0], np.cumsum(sizes)])
    chunk_first_sample = np.minimum(np.concatenate([[0], np.cumsum(spc)])[:-1], n_sz)
    within = csum[: n_sz] - csum[chunk_first_sample][chunk_of_sample]
    info["sample_sizes"] = sizes
    info["sample_offsets"] = offsets[chunk_of_sample] + within
    if b"stss" in stbl:
        ss0 = stbl[b"stss"][0]
        n_ss = struct.unpack_from(">I", blob, ss0 + 4)[0]
        info["sync_samples"] = np.frombuffer(
            blob, dtype=">u4", count=n_ss, offset=ss0 + 8
        ).astype(np.int64)
    else:
        info["sync_samples"] = np.array([], dtype=np.int64)
    return info


def extract_frames(blob: bytes, indices) -> list[bytes]:
    """Slice raw sample payloads out of mdat by resolved offsets."""
    info = parse_mp4(blob)
    off, sz = info["sample_offsets"], info["sample_sizes"]
    out = []
    for i in indices:
        if not 0 <= i < len(off):
            raise IndexError(f"sample {i} out of range 0..{len(off) - 1}")
        out.append(blob[off[i] : off[i] + sz[i]])
    return out
