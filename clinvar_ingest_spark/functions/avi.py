"""Pure-Python AVI (RIFF) codec for the multimodal VIDEO path.

The sandbox has no ffmpeg/OpenCV, but an uncompressed-DIB AVI needs
none: it is the same RIFF container grammar as WAV (chunk tag +
little-endian u32 size, word-aligned) with a ``hdrl`` header list
(``avih`` MainAVIHeader + per-stream ``strl`` holding ``strh``/``strf``)
and a ``movi`` list whose ``00db`` chunks are raw bottom-up
BGR24 device-independent bitmaps — fully decodable from the public
spec (AVI RIFF form, Microsoft Video for Windows; BITMAPINFOHEADER).

``decode_avi`` walks the nested LIST structure, cross-validates the
geometry three ways (avih vs strf vs actual chunk sizes, frame count
vs avih vs strh), strips the 4-byte DIB row padding and un-flips the
bottom-up rows — so every sampled frame comes back as the LOGICAL
top-down pixel bytes. A wrong stride, flip, or chunk walk is a wrong
integer in the pixel stats, which the analytic DuckDB oracle catches.

``encode_avi`` is the matching deterministic fixture writer (tests +
the driver query's synthetic payload generator). It inserts a JUNK
chunk with an odd-sized body before ``movi`` so decoding a fixture
exercises chunk skipping and the pad-byte rule.

Scale note: the per-payload kernel runs INSIDE Arrow-batched
``mapInPandas`` (functions/multimodal.py extract_video_features) —
Spark owns distribution; frame sampling (every k-th frame) happens in
the kernel so unsampled frames are never copied out of the payload.
A production deployment swaps this for a hardware codec behind the
same interface.

Reference analog contract: byte-exact payload handling, as in the
reference's blob IO (clinvar_ingest/cloud/gcs.py:107-110).
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Malformed / unsupported AVI payload."""


def _stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(
    width: int, height: int, us_per_frame: int, frames: list[bytes]
) -> bytes:
    """Write an uncompressed BGR24 AVI from logical top-down pixel
    bytes (``width*height*3`` per frame). Rows are flipped bottom-up
    and padded to the 4-byte DIB stride; a JUNK chunk with an odd-sized
    body precedes ``movi`` so round-trips exercise chunk skipping."""
    if width <= 0 or height <= 0:
        raise AviError("non-positive geometry")
    row = width * 3
    stride = _stride(width)
    n = len(frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,
        stride * height * (1_000_000 // max(us_per_frame, 1) or 1),
        0,
        0,
        n,
        0,
        1,  # streams
        stride * height,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,
            us_per_frame,  # scale
            1_000_000,     # rate: rate/scale = fps
            0,
            n,             # length in frames
            stride * height,
            0,
            0,
            0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    for f in frames:
        if len(f) != row * height:
            raise AviError("frame is not width*height*3 bytes")
        dib = b""
        for r in range(height - 1, -1, -1):  # bottom-up rows
            dib += f[r * row : (r + 1) * row] + b"\x00" * (stride - row)
        movi_body += _chunk(b"00db", dib)
    body = (
        b"AVI "
        + hdrl
        + _chunk(b"JUNK", b"pad?!")  # 5 bytes: odd size forces pad byte
        + _list(b"movi", movi_body)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, size) over a chunk run, honoring the
    word-align pad byte; raises on truncation."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(f"chunk {tag!r} truncated")
        yield tag, body, size
        pos = body + size + (size % 2)


def decode_avi(payload: bytes, sample_every: int = 1) -> dict:
    """Parse an uncompressed BGR24 AVI into geometry + sampled frames.

    Returns ``{width, height, us_per_frame, n_frames, frames}`` where
    ``frames`` holds every ``sample_every``-th frame (0, k, 2k, ...) as
    LOGICAL top-down ``width*height*3`` pixel bytes (padding stripped,
    bottom-up rows un-flipped). Raises :class:`AviError` on anything
    malformed: bad magic, truncated chunks, missing headers, a non-DIB
    / non-24bpp stream, geometry that contradicts itself, or a frame
    chunk whose size isn't one whole DIB."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise AviError("RIFF size exceeds payload")
    end = 8 + riff_size
    avih = None
    strf = None
    strh_len = None
    movi = None
    for tag, body, size in _walk(payload, 12, end):
        if tag != b"LIST":
            continue
        ltype = payload[body : body + 4]
        if ltype == b"hdrl":
            for t2, b2, s2 in _walk(payload, body + 4, body + size):
                if t2 == b"avih":
                    if s2 < 56:
                        raise AviError("avih too short")
                    avih = struct.unpack_from("<14I", payload, b2)
                elif t2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for t3, b3, s3 in _walk(payload, b2 + 4, b2 + s2):
                        if t3 == b"strh":
                            if s3 < 56:
                                raise AviError("strh too short")
                            if payload[b3 : b3 + 4] != b"vids":
                                continue  # non-video stream: skip
                            if payload[b3 + 4 : b3 + 8] != b"DIB ":
                                raise AviError("unsupported video codec")
                            strh_len = struct.unpack_from(
                                "<I", payload, b3 + 8 + 24
                            )[0]
                        elif t3 == b"strf" and strf is None:
                            if s3 < 40:
                                raise AviError("strf too short")
                            strf = struct.unpack_from(
                                "<IiiHHIIiiII", payload, b3
                            )
        elif ltype == b"movi":
            movi = (body + 4, body + size)
    if avih is None or strf is None or movi is None:
        raise AviError("missing avih, strf, or movi")
    us_per_frame, total_frames = avih[0], avih[4]
    width, height = avih[8], avih[9]
    (_, bi_w, bi_h, planes, bpp, compression, _, _, _, _, _) = strf
    if compression != 0 or bpp != 24 or planes != 1:
        raise AviError("unsupported DIB format (BGR24 BI_RGB only)")
    if bi_w != width or bi_h != height or width <= 0 or height <= 0:
        raise AviError("avih geometry contradicts strf")
    row = width * 3
    stride = _stride(width)
    if sample_every < 1:
        raise AviError("sample_every must be >= 1")
    frames: list[bytes] = []
    n_seen = 0
    for tag, body, size in _walk(payload, movi[0], movi[1]):
        if tag != b"00db":
            continue
        if size != stride * height:
            raise AviError("frame chunk is not one whole DIB")
        if n_seen % sample_every == 0:
            dib = np.frombuffer(
                payload, dtype=np.uint8, count=size, offset=body
            ).reshape(height, stride)
            frames.append(dib[::-1, :row].tobytes())  # un-flip, un-pad
        n_seen += 1
    if n_seen != total_frames:
        raise AviError("movi frame count contradicts avih")
    if strh_len is not None and strh_len != total_frames:
        raise AviError("strh length contradicts avih")
    return {
        "width": width,
        "height": height,
        "us_per_frame": us_per_frame,
        "n_frames": n_seen,
        "frames": frames,
    }
