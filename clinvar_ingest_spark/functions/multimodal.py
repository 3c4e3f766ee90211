"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images (and other media) ride through the engine as ``binary`` columns
with a typed feature struct, processed by Arrow-batched ``mapInPandas``
— the same vectorized path as text extraction. PNG payloads get a REAL
decode (pure-Python zlib inflate + scanline unfilter + palette
expansion, :mod:`clinvar_ingest_spark.functions.png` — the sandbox has
zlib even though it lacks PIL/libvips), emitting true width/height/
channels and exact integer pixel stats. Non-PNG payloads fall back to
byte-level features (kind='opaque'); a PNG-looking payload that fails
to parse is reported as kind='corrupt' rather than failing the batch —
at web scale some payloads are always broken, and a poison payload
must not kill the partition.

Audio gets the same treatment: RIFF/WAVE PCM payloads are REALLY parsed
(:mod:`clinvar_ingest_spark.functions.wav` — chunk walk, geometry
validation, exact integer sample stats) via :func:`decode_audio` /
:func:`extract_audio_features`. Video completes the triad: uncompressed
BGR24 AVI payloads are REALLY parsed (:mod:`functions.avi` — nested
RIFF lists, stride/flip handling, frame sampling) via
:func:`decode_video` / :func:`extract_video_features`. Formats needing
codecs absent from this sandbox (JPEG, compressed audio/video) would
slot into the same sniff-and-dispatch, keeping schema/partitioning
unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from clinvar_ingest_spark.functions.png import PngError, decode_png

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum64", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_stub(payload: bytes) -> dict:
    """Byte-level features for opaque (non-image) payloads: size, first
    byte, additive checksum over the first 64 bytes. Deterministic and
    cheap — the metadata face of a payload whose codec isn't loaded."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum64": int(sum(payload[:64]) % 997),
    }


def decode_media(payload: bytes) -> dict:
    """Sniff-and-dispatch media decode for one payload.

    PNG magic → real decode (exact integer pixel stats: sum/min/max
    over the reconstructed samples — integers so cross-engine oracles
    are exact, no float folds). Anything else → byte-level features
    with ``kind='opaque'``; unparseable PNG → ``kind='corrupt'`` (byte
    features still populated, image fields null)."""
    base = decode_stub(payload)
    base.update(
        {
            "kind": "opaque",
            "width": None,
            "height": None,
            "channels": None,
            "px_sum": None,
            "px_min": None,
            "px_max": None,
        }
    )
    if payload[:8] != _PNG_MAGIC:
        return base
    try:
        img = decode_png(payload)
    except PngError:
        base["kind"] = "corrupt"
        return base
    import numpy as np

    px = np.frombuffer(img["pixels"], dtype=np.uint8)
    base.update(
        {
            "kind": "png",
            "width": img["width"],
            "height": img["height"],
            "channels": img["channels"],
            "px_sum": int(px.sum(dtype=np.int64)),
            "px_min": int(px.min()) if px.size else None,
            "px_max": int(px.max()) if px.size else None,
        }
    )
    return base


def resize_nearest(img: dict, out_w: int, out_h: int) -> dict:
    """Nearest-neighbor resize of a decoded image (the ``decode_png``
    dict shape): output pixel (y2, x2) samples source pixel
    (y2*h // out_h, x2*w // out_w) — pure integer index math, so the
    resized pixels are bit-identical across engines (no interpolation
    rounding). Vectorized as two numpy index gathers."""
    import numpy as np

    if out_w <= 0 or out_h <= 0:
        raise ValueError("non-positive resize geometry")
    w, h, c = img["width"], img["height"], img["channels"]
    px = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, c)
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    out = px[rows][:, cols]
    return {
        "width": out_w,
        "height": out_h,
        "channels": c,
        "pixels": out.tobytes(),
    }


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def extract_resized_features(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """decode → nearest-neighbor resize → exact integer pixel stats,
    all inside one Arrow-batched mapInPandas pass (the brief's
    'resize' verb: thumbnails / fixed-size model inputs at corpus
    scale). Non-PNG payloads report kind='opaque', unparseable PNGs
    kind='corrupt' — same poison-payload contract as every other
    multimodal path."""
    import numpy as np

    def _one(payload: bytes) -> dict:
        base = {
            "kind": "opaque",
            "width": None,
            "height": None,
            "channels": None,
            "px_sum": None,
            "px_min": None,
            "px_max": None,
        }
        if payload[:8] != _PNG_MAGIC:
            return base
        try:
            img = decode_png(payload)
        except PngError:
            base["kind"] = "corrupt"
            return base
        r = resize_nearest(img, out_w, out_h)
        px = np.frombuffer(r["pixels"], dtype=np.uint8)
        base.update(
            {
                "kind": "png",
                "width": r["width"],
                "height": r["height"],
                "channels": r["channels"],
                "px_sum": int(px.sum(dtype=np.int64)),
                "px_min": int(px.min()) if px.size else None,
                "px_max": int(px.max()) if px.size else None,
            }
        )
        return base

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [_one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("s_sum", T.LongType()),
        T.StructField("s_min", T.IntegerType()),
        T.StructField("s_max", T.IntegerType()),
    ]
)


def decode_audio(payload: bytes) -> dict:
    """Sniff-and-dispatch audio decode for one payload: RIFF/WAVE magic
    → real PCM parse (functions/wav.py) with exact integer sample
    stats; anything else → ``kind='opaque'``; a WAV-looking payload
    that fails to parse → ``kind='corrupt'`` (poison payloads must not
    kill the partition at web scale). Same contract as the image path."""
    from clinvar_ingest_spark.functions.wav import WavError, decode_wav

    base = {
        "kind": "opaque",
        "n_bytes": len(payload),
        "sample_rate": None,
        "channels": None,
        "bits": None,
        "n_frames": None,
        "s_sum": None,
        "s_min": None,
        "s_max": None,
    }
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return base
    try:
        meta = decode_wav(payload)
    except WavError:
        base["kind"] = "corrupt"
        return base
    base.update(meta)
    base["kind"] = "wav"
    return base


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched mapInPandas audio feature extraction — the audio
    twin of :func:`extract_media_features`, fixed AUDIO_SCHEMA output."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [decode_audio(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("p_sum", T.LongType()),
        T.StructField("p_min", T.IntegerType()),
        T.StructField("p_max", T.IntegerType()),
    ]
)


def decode_video(payload: bytes, sample_every: int = 1) -> dict:
    """Sniff-and-dispatch video decode for one payload: RIFF/AVI magic
    → real uncompressed-DIB parse (functions/avi.py) with frame
    sampling (every k-th frame only — unsampled frames are never
    copied out of the payload) and exact integer pixel stats over the
    sampled frames; anything else → ``kind='opaque'``; an AVI-looking
    payload that fails to parse → ``kind='corrupt'``. Same contract as
    the image and audio paths."""
    from clinvar_ingest_spark.functions.avi import AviError, decode_avi

    base = {
        "kind": "opaque",
        "n_bytes": len(payload),
        "width": None,
        "height": None,
        "n_frames": None,
        "n_sampled": None,
        "p_sum": None,
        "p_min": None,
        "p_max": None,
    }
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return base
    try:
        meta = decode_avi(payload, sample_every=sample_every)
    except AviError:
        base["kind"] = "corrupt"
        return base
    import numpy as np

    frames = meta.pop("frames")
    px = (
        np.frombuffer(b"".join(frames), dtype=np.uint8)
        if frames
        else np.empty(0, dtype=np.uint8)
    )
    base.update(
        {
            "kind": "avi",
            "width": meta["width"],
            "height": meta["height"],
            "n_frames": meta["n_frames"],
            "n_sampled": len(frames),
            "p_sum": int(px.sum(dtype=np.int64)) if px.size else None,
            "p_min": int(px.min()) if px.size else None,
            "p_max": int(px.max()) if px.size else None,
        }
    )
    return base


def extract_video_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_every: int = 1,
) -> DataFrame:
    """Arrow-batched mapInPandas video feature extraction with frame
    sampling — the video leg of the multimodal triad (PNG image, WAV
    audio, AVI video: all REAL decodes), fixed VIDEO_SCHEMA output."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [
                decode_video(p, sample_every=sample_every)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=VIDEO_SCHEMA)


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    One pandas DataFrame per Arrow batch; the decode kernel runs per
    payload inside the batch (pure CPU — Spark owns distribution and
    the Arrow transfer); output schema fixed (FEATURE_SCHEMA) so
    downstream plans are stable."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [decode_media(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def decode_video_motion(payload: bytes, sample_every: int = 1) -> dict:
    """Motion-energy features for one video payload: decode (same
    sniff-and-dispatch contract as :func:`decode_video`), sample every
    k-th frame, and reduce CONSECUTIVE SAMPLED FRAME PAIRS to exact
    integer difference energies — ``motion_sum`` is the total absolute
    pixel difference across all pairs, ``motion_max_pair`` the hottest
    single transition (the scene-cut detector's raw signal). Unsampled
    frames are never copied out of the payload; per-pair arrays live
    only inside this kernel."""
    from clinvar_ingest_spark.functions.avi import AviError, decode_avi

    base = {
        "kind": "opaque",
        "width": None,
        "height": None,
        "n_sampled": None,
        "n_pairs": None,
        "motion_sum": None,
        "motion_max_pair": None,
    }
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return base
    try:
        meta = decode_avi(payload, sample_every=sample_every)
    except AviError:
        base["kind"] = "corrupt"
        return base
    import numpy as np

    frames = meta["frames"]
    arrs = [
        np.frombuffer(f, dtype=np.uint8).astype(np.int64) for f in frames
    ]
    energies = [
        int(np.abs(arrs[k + 1] - arrs[k]).sum())
        for k in range(len(arrs) - 1)
    ]
    base.update(
        {
            "kind": "avi",
            "width": meta["width"],
            "height": meta["height"],
            "n_sampled": len(frames),
            "n_pairs": len(energies),
            "motion_sum": sum(energies) if energies else None,
            "motion_max_pair": max(energies) if energies else None,
        }
    )
    return base


MOTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("n_pairs", T.IntegerType()),
        T.StructField("motion_sum", T.LongType()),
        T.StructField("motion_max_pair", T.LongType()),
    ]
)


def extract_video_motion(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_every: int = 1,
) -> DataFrame:
    """Arrow-batched mapInPandas motion-energy extraction — the
    temporal-feature verb of the video path (decode → sample →
    frame-difference reduce, all inside one kernel pass)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MOTION_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [
                decode_video_motion(p, sample_every=sample_every)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=MOTION_SCHEMA)


def decode_audio_energy(payload: bytes) -> dict:
    """Waveform features for one audio payload: centered energy (sum of
    squared deviations from the bit-depth midpoint — 128 for u8, 0 for
    s16) and the zero-crossing count (strict sign changes between
    CONSECUTIVE FRAMES of the SAME channel — the classic energy/ZCR
    speech-vs-noise pair), both exact integers. Same sniff-and-dispatch
    poison-payload contract as :func:`decode_audio`; the waveform
    array lives only inside this kernel."""
    from clinvar_ingest_spark.functions.wav import WavError, decode_wav

    base = {
        "kind": "opaque",
        "sample_rate": None,
        "channels": None,
        "bits": None,
        "n_frames": None,
        "energy": None,
        "zero_crossings": None,
    }
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return base
    try:
        meta = decode_wav(payload, return_samples=True)
    except WavError:
        base["kind"] = "corrupt"
        return base
    import numpy as np

    s = meta["samples"].astype(np.int64)
    center = 128 if meta["bits"] == 8 else 0
    c = s - center
    if meta["n_frames"] and meta["channels"]:
        bych = c.reshape(meta["n_frames"], meta["channels"])
        zc = int(((bych[:-1] * bych[1:]) < 0).sum())
    else:
        zc = 0
    base.update(
        {
            "kind": "wav",
            "sample_rate": meta["sample_rate"],
            "channels": meta["channels"],
            "bits": meta["bits"],
            "n_frames": meta["n_frames"],
            "energy": int((c * c).sum(dtype=np.int64)) if c.size else None,
            "zero_crossings": zc if c.size else None,
        }
    )
    return base


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_energy(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched mapInPandas energy/ZCR extraction — the temporal-
    feature verb of the audio path."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ENERGY_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [decode_audio_energy(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=ENERGY_SCHEMA)


def image_dhash(payload: bytes) -> dict:
    """Perceptual difference hash (dHash) for one image payload: decode
    → integer grayscale (channel sum ``div`` channels, truncating) →
    nearest-neighbor resize to 9x8 → 64 bits, bit (y,x) set iff
    gray[y][x+1] > gray[y][x]. Near-duplicate IMAGES (re-encodes,
    resizes, small crops) collide or land within a small Hamming
    distance — the image-side analog of the text MinHash family, and
    every step is integer-exact so the hash itself value-hashes across
    engines. Returned as two BIGINT halves (bits 63..32 and 31..0) to
    stay inside signed-64 range everywhere.

    Same poison-payload contract as every decode path."""
    import numpy as np

    from clinvar_ingest_spark.functions.png import PngError, decode_png

    base = {"kind": "opaque", "dhash_hi": None, "dhash_lo": None}
    if payload[:8] != _PNG_MAGIC:
        return base
    try:
        img = decode_png(payload)
    except PngError:
        base["kind"] = "corrupt"
        return base
    w, h, c = img["width"], img["height"], img["channels"]
    px = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, c)
    gray = px.astype(np.int64).sum(axis=2) // c
    g = {
        "width": w,
        "height": h,
        "channels": 1,
        # uint8-safe: gray is a channel mean, always 0..255
        "pixels": gray.astype(np.uint8).tobytes(),
    }
    r = resize_nearest(g, 9, 8)
    gr = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(8, 9).astype(
        np.int64
    )
    bits = (gr[:, 1:] > gr[:, :-1]).reshape(-1)  # bitpos = y*8 + x
    hi = lo = 0
    for pos, b in enumerate(bits):
        if not b:
            continue
        if pos >= 32:
            hi |= 1 << (pos - 32)
        else:
            lo |= 1 << pos
    base.update({"kind": "png", "dhash_hi": hi, "dhash_lo": lo})
    return base


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
    ]
)


def extract_image_dhash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched mapInPandas dHash extraction; group the output on
    (dhash_hi, dhash_lo) for exact perceptual dedup, or band the halves
    for a Hamming-tolerant bucket join (the SimHash recipe)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DHASH_SCHEMA.fields if f.name != "doc_id"]
        for pdf in batches:
            feats = [image_dhash(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(_extract, schema=DHASH_SCHEMA)
