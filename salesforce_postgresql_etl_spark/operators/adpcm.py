"""IMA ADPCM (DVI4) codec in pure Python — fixture-grade.

The second genuinely COMPRESSED audio codec here (after G.711
companding): 4 bits per sample, 4:1 vs 16-bit PCM, decoded with the
public-domain IMA/DVI algorithm (the step/index tables and nibble
reconstruction published in the IMA "Recommended Practices for
Enhancing Digital Audio Compatibility" spec and RFC 3551 §4.5.1).
``operators/multimodal.decode_wav`` dispatches WAVE format 0x11
(IMA ADPCM) here; this module handles the raw per-channel state
machine and the WAV block layout (per-channel 4-byte block headers,
interleaved 4-byte nibble groups for stereo).

Like the other codecs this is correctness-grade Python — the 100 TB
story is the Arrow-batched BinaryType carriage in
``operators/multimodal.py``, not this inner loop.
"""

from __future__ import annotations

import struct

# Public IMA tables: first-order predictor step sizes (89 entries,
# ~1.1x geometric growth) and the per-nibble step-index adaptation.
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One 4-bit code → (new predictor, new step index). The
    reconstruction sums step/1, step/2, step/4 for the three magnitude
    bits plus the always-on step/8 term (integer shifts, bit-exact
    with the reference algorithm)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    index = index + INDEX_TABLE[nibble]
    return pred, (0 if index < 0 else (88 if index > 88 else index))


def _encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One linear sample → (nibble, new predictor, new index), the
    mirror of ``_decode_nibble`` (encoder-side state must track the
    DECODER's reconstruction, not the true input, or errors drift)."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred, index = _decode_nibble(nibble, pred, index)
    return nibble, pred, index


def _seed_index(block: list[int]) -> int:
    """Initial step index for one block: the smallest index whose step
    covers the block's mean |Δ| (the header stores the index, so the
    encoder is free to pick — seeding kills the attack transient a
    cold index-0 start would smear over the first ~40 samples)."""
    if len(block) < 2:
        return 0
    mean_delta = sum(
        abs(b - a) for a, b in zip(block, block[1:])
    ) // (len(block) - 1)
    for i, step in enumerate(STEP_TABLE):
        if step >= mean_delta:
            return i
    return 88


def samples_per_block(block_align: int, n_channels: int) -> int:
    """WAV layout arithmetic: each block stores one 16-bit sample per
    channel in its header plus two nibbles per data byte."""
    if block_align < 4 * n_channels or block_align % (4 * n_channels):
        raise ValueError(
            f"ADPCM block_align {block_align} not a positive multiple of "
            f"4*channels ({4 * n_channels})"
        )
    return (block_align - 4 * n_channels) * 2 // n_channels + 1


def decode_blocks(data: bytes, block_align: int, n_channels: int) -> list[int]:
    """WAV 'data' chunk payload → interleaved linear samples. Blocks
    must tile the payload exactly (a torn final block raises — honest
    scope). Stereo nibbles come in alternating 4-byte per-channel
    groups per the WAV ADPCM layout."""
    if block_align <= 0 or len(data) % block_align:
        raise ValueError(
            f"ADPCM data ({len(data)} bytes) not a whole number of "
            f"{block_align}-byte blocks"
        )
    spb = samples_per_block(block_align, n_channels)
    out: list[int] = []
    for base in range(0, len(data), block_align):
        preds, indexes = [], []
        for ch in range(n_channels):
            pred, index, reserved = struct.unpack_from(
                "<hBB", data, base + 4 * ch
            )
            if index > 88:
                raise ValueError(f"ADPCM step index {index} out of range")
            preds.append(pred)
            indexes.append(index)
        # Header predictor IS the first output sample of the block.
        chans: list[list[int]] = [[p] for p in preds]
        pos = base + 4 * n_channels
        end = base + block_align
        while pos < end:
            for ch in range(n_channels):
                for k in range(4):  # 4 bytes = 8 nibbles per channel
                    byte = data[pos + 4 * ch + k]
                    for nib in (byte & 0x0F, byte >> 4):  # low first
                        preds[ch], indexes[ch] = _decode_nibble(
                            nib, preds[ch], indexes[ch]
                        )
                        chans[ch].append(preds[ch])
            pos += 4 * n_channels
        for i in range(spb):
            for ch in range(n_channels):
                out.append(chans[ch][i])
    return out


def encode_blocks(
    samples: list[int], block_align: int, n_channels: int
) -> bytes:
    """Interleaved linear samples → WAV ADPCM 'data' payload. The
    final block is padded by repeating each channel's last sample
    (decode + the 'fact' frame count trims it back). Encoder state
    (step index) carries across blocks, stored in each block header
    per the format."""
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples must interleave n_channels evenly")
    if not samples:
        raise ValueError("need at least one sample frame")
    spb = samples_per_block(block_align, n_channels)
    chans = [samples[ch::n_channels] for ch in range(n_channels)]
    n_frames = len(chans[0])
    pad = (-n_frames) % spb
    for c in chans:
        c.extend([c[-1]] * pad)
    total = n_frames + pad
    out = bytearray()
    for base in range(0, total, spb):
        preds, indexes = [], []
        for ch in range(n_channels):
            first = _clamp16(chans[ch][base])
            block = chans[ch][base : base + spb]
            preds.append(first)
            indexes.append(_seed_index(block))
            out += struct.pack("<hBB", first, indexes[ch], 0)
        for group in range(base + 1, base + spb, 8):
            for ch in range(n_channels):
                nibbles = []
                for i in range(group, group + 8):
                    s = _clamp16(chans[ch][i])
                    nib, preds[ch], indexes[ch] = _encode_sample(
                        s, preds[ch], indexes[ch]
                    )
                    nibbles.append(nib)
                for k in range(0, 8, 2):
                    out.append(nibbles[k] | (nibbles[k + 1] << 4))
    return bytes(out)
