"""Pure-Python WAV (RIFF/WAVE PCM) codec for the multimodal audio path.

The sandbox has no soundfile/librosa, but PCM WAV needs none: it is a
RIFF container (chunk tag + little-endian u32 size, word-aligned) with
a ``fmt `` chunk describing the sample layout and a ``data`` chunk of
raw PCM frames — fully decodable from the public spec (RIFF 1991 /
WAVE format registry). ``decode_wav`` walks the chunk list (skipping
unknown chunks such as LIST/INFO, honoring the odd-size pad byte),
validates the fmt geometry, and returns the true sample rate / channel
count / bit depth / frame count plus EXACT integer sample statistics
(sum/min/max in the sample domain: unsigned for 8-bit, signed
little-endian for 16-bit) — so a wrong endianness, sign convention, or
chunk walk is a wrong integer, which the analytic DuckDB oracle
catches.

``encode_wav`` is the matching deterministic fixture writer (tests +
the driver query's synthetic payload generator). It interleaves a LIST
chunk (with an odd-sized body, exercising the pad-byte rule) before
``data`` so decoding a fixture exercises the skip path.

Scale note: per-payload kernel invoked INSIDE Arrow-batched
``mapInPandas`` (functions/multimodal.py) — Spark owns distribution;
the kernel is numpy-vectorized over the frame bytes. A production
deployment swaps this for a C codec behind the same interface.

Reference analog contract: byte-exact payload handling, as in the
reference's blob IO (clinvar_ingest/cloud/gcs.py:107-110).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed / unsupported WAV payload."""


def encode_wav(
    sample_rate: int, channels: int, bits: int, frames: bytes
) -> bytes:
    """Write a PCM WAV from raw interleaved ``frames`` bytes.

    ``bits`` in {8, 16}; ``frames`` length must be a whole number of
    (channels × bits/8)-byte frames. Inserts an odd-sized LIST chunk
    before ``data`` so round-trip tests exercise chunk skipping and
    word alignment."""
    if bits not in (8, 16):
        raise WavError(f"unsupported bit depth {bits}")
    block_align = channels * bits // 8
    if block_align == 0 or len(frames) % block_align:
        raise WavError("frames not a whole number of blocks")
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    info = b"INFOsrc"  # 7 bytes: odd size forces the pad byte
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes, return_samples: bool = False) -> dict:
    """Parse a PCM WAV payload into geometry + exact sample stats.

    Returns ``{sample_rate, channels, bits, n_frames, s_sum, s_min,
    s_max}`` where the stats cover every sample of every channel in the
    sample domain (u8 for 8-bit, s16 LE for 16-bit; empty data → null
    stats). ``return_samples=True`` adds a ``samples`` numpy array
    (interleaved, native sample domain) for feature kernels that need
    the waveform — kernel-internal only, never a DataFrame column.
    Raises :class:`WavError` on anything malformed: bad magic,
    truncated chunks, missing/short fmt, non-PCM codec, geometry that
    contradicts itself, or a data chunk that is not whole frames."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise WavError("RIFF size exceeds payload")
    pos, end = 12, 8 + riff_size
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise WavError(f"chunk {tag!r} truncated")
        if tag == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, body_start)
        elif tag == b"data":
            data = payload[body_start : body_start + size]
        pos = body_start + size + (size % 2)  # word-aligned chunks
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    codec, channels, sample_rate, byte_rate, block_align, bits = fmt
    if codec != 1:
        raise WavError(f"unsupported codec {codec} (PCM only)")
    if bits not in (8, 16) or channels < 1:
        raise WavError(f"unsupported geometry bits={bits} channels={channels}")
    if block_align != channels * bits // 8:
        raise WavError("block_align contradicts channels × bits")
    if byte_rate != sample_rate * block_align:
        raise WavError("byte_rate contradicts geometry")
    if len(data) % block_align:
        raise WavError("data chunk is not whole frames")
    samples = np.frombuffer(data, dtype=np.uint8 if bits == 8 else "<i2")
    out = {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_frames": len(data) // block_align,
        "s_sum": int(samples.sum(dtype=np.int64)) if samples.size else None,
        "s_min": int(samples.min()) if samples.size else None,
        "s_max": int(samples.max()) if samples.size else None,
    }
    if return_samples:
        out["samples"] = samples
    return out
