"""IMA/DVI ADPCM codec (WAVE format 0x0011), pure numpy.

The compressed-audio leg of the codec surface. Unlike the perceptual
MPEG codecs (whose decode needs the ISO Huffman tables and the 512-tap
synthesis window as literal spec data — see ROADMAP), IMA ADPCM is
almost entirely algorithmic: a 3-bit-magnitude delta quantizer driving
an 89-entry exponential step table (the one piece of published table
data, reproduced below from the IMA ADPCM reference algorithm, which is
public domain) and an 8-entry step-index adaptation table. 4 bits per
sample, ~4:1 over int16 PCM — the classic telephony/game-audio codec.

Layout (IMA-in-WAV, mono): the stream is a sequence of independent
blocks of ``block_align`` bytes. Each block opens with a 4-byte header
(int16 LE predictor seed = the first sample, uint8 step index, one
reserved byte) followed by packed nibbles, LOW nibble first; a block
carries ``(block_align - 4) * 2 + 1`` samples (the seed plus two per
payload byte).

Vectorization: the predictor recursion is sequential per sample but
blocks are independent, so both directions reshape the clip into
``(n_blocks, samples_per_block)`` and run the recursion ACROSS blocks —
the Python loop is ``samples_per_block`` long and every iteration is a
numpy step over all blocks at once (the same trick the PNG filters use
across scanlines). The encoder resets the step index to 0 at each block
head, making blocks fully independent (seekable; valid per spec — the
header stores whatever index the encoder chose).

Decoder parity: ``decode(encode(x))`` equals the encoder's internal
reconstruction BIT-EXACTLY (both run the identical clamped state
machine), which is what the ``md5 `` sidecar chunk in
``sources/audio.synth_adpcm`` pins through the correctness gate.
"""

from __future__ import annotations

import numpy as np

# IMA ADPCM step-size table (89 entries) — public-domain IMA reference
# algorithm ("Recommended Practices for Enhancing Digital Audio
# Compatibility in Multimedia Systems", IMA 1992).
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)

# Step-index adjustment per 3-bit code magnitude (sign bit excluded).
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def samples_per_block(block_align: int) -> int:
    """Samples carried by one mono IMA block of ``block_align`` bytes."""
    if block_align < 6 or block_align % 2:
        raise ValueError(f"bad IMA block_align {block_align}")
    return (block_align - 4) * 2 + 1


def _step_updates(code: np.ndarray, pred: np.ndarray, index: np.ndarray):
    """One quantizer step: (nibble codes, predictor, step index) →
    updated (predictor, index). All arrays are per-block vectors."""
    step = STEP_TABLE[index]
    # diff = (step/8) + (step/4)*b0 + (step/2)*b1 + step*b2, exact ints
    diff = step >> 3
    diff += np.where(code & 1, step >> 2, 0)
    diff += np.where(code & 2, step >> 1, 0)
    diff += np.where(code & 4, step, 0)
    pred = np.where(code & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + INDEX_TABLE[code & 7], 0, 88)
    return pred, index


def adpcm_decode(data: bytes, block_align: int, n_samples: int | None = None) -> np.ndarray:
    """IMA ADPCM block stream → int16 mono PCM.

    ``n_samples`` (the WAV ``fact`` count) trims the final block's
    padding nibbles; omitted, every carried sample is returned.
    """
    spb = samples_per_block(block_align)
    raw = np.frombuffer(data, dtype=np.uint8)
    if len(raw) == 0 or len(raw) % block_align:
        raise ValueError(
            f"IMA payload of {len(raw)} bytes is not a whole number of "
            f"{block_align}-byte blocks"
        )
    blocks = raw.reshape(-1, block_align)
    n_blocks = blocks.shape[0]

    pred = blocks[:, :2].copy().view("<i2").astype(np.int32).ravel()
    index = blocks[:, 2].astype(np.int32)
    if np.any(index > 88):
        raise ValueError("IMA block header step index > 88")

    payload = blocks[:, 4:]
    # nibble order: low first — interleave into (n_blocks, spb-1)
    codes = np.empty((n_blocks, (block_align - 4) * 2), dtype=np.uint8)
    codes[:, 0::2] = payload & 0x0F
    codes[:, 1::2] = payload >> 4

    out = np.empty((n_blocks, spb), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for t in range(codes.shape[1]):
        pred, index = _step_updates(codes[:, t].astype(np.int32), pred, index)
        out[:, t + 1] = pred.astype(np.int16)

    pcm = out.ravel()
    if n_samples is not None:
        if n_samples > len(pcm) or n_samples <= (n_blocks - 1) * spb:
            raise ValueError(
                f"fact count {n_samples} inconsistent with {n_blocks} "
                f"blocks of {spb} samples"
            )
        pcm = pcm[:n_samples]
    return pcm


def adpcm_encode(pcm: np.ndarray, block_align: int = 256) -> tuple[bytes, np.ndarray]:
    """int16 mono PCM → (IMA block stream, bit-exact reconstruction).

    The final partial block is padded by repeating the last sample
    (decoders trim via the ``fact`` count). Returns the reconstruction
    the decoder will produce, for PSNR tests and the md5 sidecar.
    """
    pcm = np.asarray(pcm, dtype=np.int16)
    if len(pcm) == 0:
        raise ValueError("cannot encode an empty clip")
    spb = samples_per_block(block_align)
    n_blocks = -(-len(pcm) // spb)
    padded = np.full(n_blocks * spb, pcm[-1], dtype=np.int16)
    padded[: len(pcm)] = pcm
    grid = padded.reshape(n_blocks, spb).astype(np.int32)

    pred = grid[:, 0].copy()
    index = np.zeros(n_blocks, dtype=np.int32)
    codes = np.empty((n_blocks, spb - 1), dtype=np.uint8)
    recon = np.empty((n_blocks, spb), dtype=np.int16)
    recon[:, 0] = pred.astype(np.int16)
    for t in range(spb - 1):
        target = grid[:, t + 1]
        step = STEP_TABLE[index]
        diff = target - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        # greedy 3-bit magnitude: bit k set when mag >= step>>(2-k)
        code = np.zeros(n_blocks, dtype=np.int32)
        b2 = (mag >= step).astype(np.int32)
        mag -= b2 * step
        b1 = (mag >= (step >> 1)).astype(np.int32)
        mag -= b1 * (step >> 1)
        b0 = (mag >= (step >> 2)).astype(np.int32)
        code = (sign << 3) | (b2 << 2) | (b1 << 1) | b0
        codes[:, t] = code.astype(np.uint8)
        pred, index = _step_updates(code, pred, index)
        recon[:, t + 1] = pred.astype(np.int16)

    payload = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
    header = np.zeros((n_blocks, 4), dtype=np.uint8)
    header[:, :2] = grid[:, 0].astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    # step index byte stays 0 (reset per block); reserved byte 0
    stream = np.concatenate([header, payload], axis=1).tobytes()
    return stream, recon.ravel()[: len(pcm)]
