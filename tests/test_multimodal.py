"""Real multimodal decode: pure-Python PNG codec + Arrow plumbing."""

import struct
import zlib

import numpy as np
import pytest

from clinvar_ingest_spark.functions.png import (
    PngError,
    _SIG,
    _chunk,
    decode_png,
    encode_png,
)


def test_png_roundtrip_all_filters_and_channel_counts():
    """Heights >= 5 exercise every scanline filter (the fixture encoder
    cycles filter type with the row index); channels 1..4 cover gray,
    gray+alpha, RGB, RGBA."""
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for w, h in [(1, 1), (3, 7), (16, 9), (33, 12)]:
            px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
            out = decode_png(encode_png(w, h, px, ch))
            assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
            assert out["pixels"] == px


def test_png_palette_expansion():
    rng = np.random.default_rng(3)
    w, h = 5, 4
    idx = rng.integers(0, 4, size=w * h, dtype=np.uint8)
    plte = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(idx[y * w : (y + 1) * w].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    blob = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert out["channels"] == 3
    assert out["pixels"] == plte[idx].tobytes()


def test_png_rejects_malformed_input():
    good = encode_png(4, 4, bytes(range(16)), 1)
    cases = [
        good[:20],                      # truncated mid-IHDR
        good[:8],                       # signature only
        b"JPEG" + good,                 # bad signature
        good[:-6] + b"\x00" + good[-5:],  # corrupted CRC tail
    ]
    for bad in cases:
        with pytest.raises(PngError):
            decode_png(bad)
    # bad filter byte inside an otherwise valid stream
    raw = b"\x09" + bytes(4)
    blob = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="filter"):
        decode_png(blob)
    # 16-bit depth unsupported (honest refusal, not silent garbage)
    blob = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" + bytes(4)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="bit depth"):
        decode_png(blob)


def test_decode_media_dispatch():
    """Sniff-and-dispatch: PNG -> real decode, non-PNG -> opaque byte
    features, PNG-magic-but-broken -> 'corrupt' (poison payloads must
    not kill a partition at web scale)."""
    from clinvar_ingest_spark.functions.multimodal import decode_media

    good = encode_png(4, 4, bytes(range(16)), 1)
    m = decode_media(good)
    assert m["kind"] == "png"
    assert (m["width"], m["height"], m["channels"]) == (4, 4, 1)
    assert (m["px_sum"], m["px_min"], m["px_max"]) == (sum(range(16)), 0, 15)

    m2 = decode_media(b"hello")
    assert m2["kind"] == "opaque" and m2["width"] is None
    assert m2["n_bytes"] == 5 and m2["first_byte"] == ord("h")

    m3 = decode_media(_SIG + b"garbage")
    assert m3["kind"] == "corrupt" and m3["px_sum"] is None
    assert m3["n_bytes"] == len(_SIG + b"garbage")


def test_extract_media_features_end_to_end(spark):
    """Arrow-batched mapInPandas over mixed payloads: real PNGs decoded
    (values verified against numpy ground truth), opaque and corrupt
    rows classified — one plan, no per-row Python."""
    from clinvar_ingest_spark.functions.multimodal import (
        extract_media_features,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=6 * 5 * 3, dtype=np.uint8)
    rows = [
        (0, encode_png(6, 5, px.tobytes(), 3)),
        (1, b"plain bytes"),
        (2, _SIG + b"broken"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in extract_media_features(df).collect()}
    assert got[0]["kind"] == "png"
    assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (6, 5, 3)
    assert got[0]["px_sum"] == int(px.sum(dtype=np.int64))
    assert got[0]["px_min"] == int(px.min()) and got[0]["px_max"] == int(px.max())
    assert got[1]["kind"] == "opaque" and got[2]["kind"] == "corrupt"
    plan = (
        extract_media_features(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan


def test_wav_roundtrip_geometry_and_stats():
    """Encode→decode round-trips every (bits, channels) combo with exact
    numpy-checked sample stats; the fixture's odd-sized LIST chunk
    exercises chunk skipping + the pad-byte rule."""
    import numpy as np

    from clinvar_ingest_spark.functions.wav import decode_wav, encode_wav

    for bits in (8, 16):
        for ch in (1, 2):
            n = 37  # odd frame count → odd data size for 8-bit mono
            idx = np.arange(n * ch, dtype=np.int64)
            if bits == 8:
                s = ((idx * 29 + 7) % 256).astype(np.uint8)
            else:
                s = (((idx * 29 + 7) % 65536) - 32768).astype("<i2")
            wav = encode_wav(8000, ch, bits, s.tobytes())
            got = decode_wav(wav)
            assert got == {
                "sample_rate": 8000, "channels": ch, "bits": bits,
                "n_frames": n,
                "s_sum": int(s.sum(dtype=np.int64)),
                "s_min": int(s.min()), "s_max": int(s.max()),
            }


def test_wav_rejects_malformed_input():
    import struct

    import numpy as np
    import pytest

    from clinvar_ingest_spark.functions.wav import WavError, decode_wav, encode_wav

    good = encode_wav(8000, 1, 16, np.zeros(8, dtype="<i2").tobytes())
    cases = [
        b"",                                  # empty
        b"RIFF\x00\x00\x00\x00DATA",          # wrong form type
        good[:16],                            # truncated (riff size lies)
        good.replace(b"data", b"datx"),       # no data chunk
        good.replace(b"fmt ", b"fmtx"),       # no fmt chunk
        # non-PCM codec id
        good[:20] + struct.pack("<H", 3) + good[22:],
        # block_align contradicting channels×bits
        good[:32] + struct.pack("<H", 7) + good[34:],
    ]
    for c in cases:
        with pytest.raises(WavError):
            decode_wav(c)
    # encoder refuses frames that aren't whole blocks
    with pytest.raises(WavError):
        encode_wav(8000, 2, 16, b"\x00" * 6)


def test_decode_audio_dispatch(spark):
    """RIFF/WAVE → real parse; truncated WAV → corrupt; other bytes →
    opaque; and the mapInPandas plan stays Arrow-side."""
    import numpy as np

    from clinvar_ingest_spark.functions.multimodal import (
        decode_audio,
        extract_audio_features,
    )
    from clinvar_ingest_spark.functions.wav import encode_wav

    wav = encode_wav(16000, 2, 16, np.arange(12, dtype="<i2").tobytes())
    ok = decode_audio(wav)
    assert (ok["kind"], ok["sample_rate"], ok["channels"], ok["n_frames"]) == (
        "wav", 16000, 2, 6,
    )
    assert decode_audio(wav[:16])["kind"] == "corrupt"
    assert decode_audio(b"plain text")["kind"] == "opaque"

    df = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(b"x")), (2, bytearray(wav[:16]))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["kind"] for r in extract_audio_features(df).collect()}
    assert got == {0: "wav", 1: "opaque", 2: "corrupt"}
    plan = (
        extract_audio_features(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan


def test_avi_roundtrip_sampling_and_stats():
    """Encode→decode round-trips logical frames exactly (stride padding
    stripped, bottom-up rows un-flipped); frame sampling returns every
    k-th frame; the JUNK chunk exercises chunk skipping."""
    import numpy as np

    from clinvar_ingest_spark.functions.avi import decode_avi, encode_avi

    w, h, nf = 5, 4, 7  # width 5 → row 15, stride 16: real padding
    frames = [
        ((np.arange(w * h * 3, dtype=np.int64) * 13 + f * 31) % 256)
        .astype(np.uint8)
        .tobytes()
        for f in range(nf)
    ]
    avi = encode_avi(w, h, 40_000, frames)
    got = decode_avi(avi)
    assert (got["width"], got["height"], got["n_frames"]) == (w, h, nf)
    assert got["us_per_frame"] == 40_000
    assert got["frames"] == frames  # byte-exact logical round-trip
    sampled = decode_avi(avi, sample_every=3)
    assert sampled["n_frames"] == nf
    assert sampled["frames"] == [frames[0], frames[3], frames[6]]


def test_avi_rejects_malformed_input():
    import struct

    import numpy as np
    import pytest

    from clinvar_ingest_spark.functions.avi import AviError, decode_avi, encode_avi

    w, h = 3, 2
    f = np.zeros(w * h * 3, dtype=np.uint8).tobytes()
    good = bytearray(encode_avi(w, h, 40_000, [f, f]))
    with pytest.raises(AviError):
        decode_avi(bytes(good[:40]))  # truncated
    with pytest.raises(AviError):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # wrong form
    bad_count = bytearray(good)
    # corrupt avih total_frames (offset: find 'avih' tag body + 16)
    i = bytes(good).index(b"avih") + 8 + 16
    bad_count[i : i + 4] = struct.pack("<I", 9)
    with pytest.raises(AviError):
        decode_avi(bytes(bad_count))  # movi count contradicts avih
    bad_bpp = bytearray(good)
    i = bytes(good).index(b"strf") + 8 + 14
    bad_bpp[i : i + 2] = struct.pack("<H", 8)
    with pytest.raises(AviError):
        decode_avi(bytes(bad_bpp))  # non-24bpp
    with pytest.raises(AviError):
        encode_avi(w, h, 40_000, [f[:-1]])  # short frame


def test_decode_video_dispatch_and_extract(spark):
    """Sniff-and-dispatch + Arrow-batched extraction end-to-end: real
    AVI rows get true geometry and exact sampled-pixel stats, opaque
    rows byte features, corrupt rows degrade without killing the
    partition."""
    import numpy as np

    from clinvar_ingest_spark.functions.avi import encode_avi
    from clinvar_ingest_spark.functions.multimodal import (
        decode_video,
        extract_video_features,
    )

    w, h, nf = 2, 2, 5
    frames = [
        ((np.arange(w * h * 3, dtype=np.int64) * 7 + f) % 256)
        .astype(np.uint8)
        .tobytes()
        for f in range(nf)
    ]
    avi = encode_avi(w, h, 33_333, frames)
    sampled = b"".join(frames[0::2])
    want_sum = sum(sampled)
    rows = [
        (1, avi),
        (2, b"not a video"),
        (3, avi[:30]),  # AVI magic but truncated → corrupt
    ]
    d = decode_video(avi, sample_every=2)
    assert (d["kind"], d["n_frames"], d["n_sampled"]) == ("avi", nf, 3)
    assert d["p_sum"] == want_sum
    assert d["p_min"] == min(sampled) and d["p_max"] == max(sampled)
    assert decode_video(b"xx")["kind"] == "opaque"
    assert decode_video(avi[:30])["kind"] == "corrupt"

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_video_features(df, sample_every=2).collect()
    }
    assert got[1]["kind"] == "avi" and got[1]["p_sum"] == want_sum
    assert got[1]["width"] == w and got[1]["n_sampled"] == 3
    assert got[2]["kind"] == "opaque" and got[2]["n_bytes"] == 11
    assert got[3]["kind"] == "corrupt"


def test_resize_nearest_exact_sampling(spark):
    """Nearest-neighbor resize is pure integer index math: output pixel
    (y2, x2) must equal source pixel (y2*h//out_h, x2*w//out_w) for
    every channel — checked against a hand-computed gather, then
    end-to-end through extract_resized_features."""
    import numpy as np

    from clinvar_ingest_spark.functions.multimodal import (
        extract_resized_features,
        resize_nearest,
    )
    from clinvar_ingest_spark.functions.png import encode_png

    w, h, c = 5, 4, 3
    px = ((np.arange(w * h * c, dtype=np.int64) * 11 + 3) % 256).astype(
        np.uint8
    )
    img = {"width": w, "height": h, "channels": c, "pixels": px.tobytes()}
    out_w, out_h = 3, 2
    r = resize_nearest(img, out_w, out_h)
    src = px.reshape(h, w, c)
    want = np.stack(
        [
            np.stack(
                [src[y2 * h // out_h, x2 * w // out_w] for x2 in range(out_w)]
            )
            for y2 in range(out_h)
        ]
    )
    assert r["pixels"] == want.tobytes()
    # upscale repeats pixels
    up = resize_nearest(img, 10, 8)
    assert (up["width"], up["height"]) == (10, 8)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_nearest(img, 0, 2)

    png = encode_png(w, h, px.tobytes(), c)
    df = spark.createDataFrame(
        [(1, png), (2, b"nope"), (3, png[:20])], "doc_id long, payload binary"
    )
    got = {
        r2["doc_id"]: r2
        for r2 in extract_resized_features(df, out_w, out_h).collect()
    }
    flat = want.reshape(-1).astype(np.int64)
    assert got[1]["kind"] == "png" and got[1]["px_sum"] == int(flat.sum())
    assert got[1]["px_min"] == int(flat.min())
    assert got[2]["kind"] == "opaque" and got[3]["kind"] == "corrupt"


def test_decoders_never_crash_on_fuzzed_payloads():
    """Poison-payload contract, fuzzed: for ANY byte string — raw
    garbage, magic-prefixed garbage, and truncated/bit-flipped REAL
    encodings — every decoder dispatch returns a dict with a valid
    kind and never raises. Pure Python (the same code the Arrow
    kernels run per batch), so the fuzz loop is cheap."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clinvar_ingest_spark.functions.avi import encode_avi
    from clinvar_ingest_spark.functions.multimodal import (
        decode_audio,
        decode_media,
        decode_video,
    )
    from clinvar_ingest_spark.functions.png import encode_png
    from clinvar_ingest_spark.functions.wav import encode_wav

    png = encode_png(
        3, 2, np.arange(18, dtype=np.uint8).tobytes(), 3
    )
    wav = encode_wav(8000, 1, 16, np.arange(8, dtype="<i2").tobytes())
    avi = encode_avi(
        2, 2, 40_000, [bytes(range(12)), bytes(range(12, 24))]
    )

    @given(
        raw=st.binary(max_size=80),
        cut=st.integers(min_value=0, max_value=200),
        flip=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=200, deadline=None)
    def _fuzz(raw, cut, flip):
        candidates = [
            raw,
            b"\x89PNG\r\n\x1a\n" + raw,
            b"RIFF" + raw[:4].ljust(4, b"\0") + b"WAVE" + raw,
            b"RIFF" + raw[:4].ljust(4, b"\0") + b"AVI " + raw,
        ]
        for real in (png, wav, avi):
            t = bytearray(real[:cut] if cut < len(real) else real)
            if t:
                t[flip % len(t)] ^= 0xFF
            candidates.append(bytes(t))
        for payload in candidates:
            m = decode_media(payload)
            assert m["kind"] in ("png", "opaque", "corrupt")
            a = decode_audio(payload)
            assert a["kind"] in ("wav", "opaque", "corrupt")
            v = decode_video(payload, sample_every=2)
            assert v["kind"] in ("avi", "opaque", "corrupt")

    _fuzz()


def test_video_motion_energy_hand_computed(spark):
    """Motion energy = sum |pixel diff| over consecutive SAMPLED frame
    pairs: hand-computed against the raw frames, sample phase checked
    (sample_every=2 pairs frames 0-2 and 2-4, never 0-1), single-
    sampled-frame videos report n_pairs 0 with NULL energies, poison
    payloads keep the corrupt/opaque contract."""
    import numpy as np

    from clinvar_ingest_spark.functions.avi import encode_avi
    from clinvar_ingest_spark.functions.multimodal import (
        decode_video_motion,
        extract_video_motion,
    )

    w, h = 2, 2
    n = w * h * 3
    frames = [
        (np.arange(n, dtype=np.int64) * (f + 1) % 256)
        .astype(np.uint8)
        .tobytes()
        for f in range(5)
    ]
    avi = encode_avi(w, h, 40_000, frames)
    got = decode_video_motion(avi, sample_every=2)
    a = [np.frombuffer(frames[f], np.uint8).astype(np.int64) for f in (0, 2, 4)]
    e1 = int(np.abs(a[1] - a[0]).sum())
    e2 = int(np.abs(a[2] - a[1]).sum())
    assert got["kind"] == "avi" and got["n_sampled"] == 3
    assert got["n_pairs"] == 2
    assert got["motion_sum"] == e1 + e2
    assert got["motion_max_pair"] == max(e1, e2)
    one = decode_video_motion(
        encode_avi(w, h, 40_000, frames[:1]), sample_every=2
    )
    assert one["n_pairs"] == 0 and one["motion_sum"] is None
    assert decode_video_motion(b"junkpayload")["kind"] == "opaque"
    assert decode_video_motion(avi[:16])["kind"] == "corrupt"

    df = spark.createDataFrame(
        [(1, avi), (2, b"junk")], "doc_id long, payload binary"
    )
    rows = {
        r["doc_id"]: r
        for r in extract_video_motion(df, sample_every=2).collect()
    }
    assert rows[1]["motion_sum"] == e1 + e2
    assert rows[2]["kind"] == "opaque"


def test_audio_energy_and_zero_crossings_hand_computed(spark):
    """Energy = centered sum of squares; ZCR = strict sign changes
    between consecutive frames of the SAME channel (never across the
    interleave) — hand-computed on a 2-channel signal whose channels
    cross at different frames; zero samples never cross; poison
    contract holds."""
    import numpy as np

    from clinvar_ingest_spark.functions.multimodal import (
        decode_audio_energy,
        extract_audio_energy,
    )
    from clinvar_ingest_spark.functions.wav import encode_wav

    # ch0: +5 -3 +2 0 -7  (crossings: f0-f1, f1-f2; f3 is zero -> none)
    # ch1: -1 -2 +4 +6 -8 (crossings: f1-f2, f3-f4)
    ch0 = [5, -3, 2, 0, -7]
    ch1 = [-1, -2, 4, 6, -8]
    inter = np.array(
        [v for pair in zip(ch0, ch1) for v in pair], dtype="<i2"
    )
    wav = encode_wav(8000, 2, 16, inter.tobytes())
    got = decode_audio_energy(wav)
    assert got["kind"] == "wav" and got["n_frames"] == 5
    assert got["energy"] == sum(v * v for v in ch0 + ch1)
    assert got["zero_crossings"] == 4
    # u8 path centers at 128: 127|129 alternation crosses every frame
    u8 = np.array([127, 129, 127, 129], dtype=np.uint8)
    got8 = decode_audio_energy(encode_wav(8000, 1, 8, u8.tobytes()))
    assert got8["energy"] == 4 and got8["zero_crossings"] == 3
    assert decode_audio_energy(b"junk")["kind"] == "opaque"
    assert decode_audio_energy(wav[:12])["kind"] == "corrupt"

    df = spark.createDataFrame(
        [(1, wav), (2, b"junk")], "doc_id long, payload binary"
    )
    rows = {
        r["doc_id"]: r for r in extract_audio_energy(df).collect()
    }
    assert rows[1]["zero_crossings"] == 4
    assert rows[2]["kind"] == "opaque"


def test_image_dhash_upscale_invariant_and_exact(spark):
    """dHash is a perceptual hash: a nearest-neighbor 2x upscale (a
    'bigger copy' of the same picture) must produce the IDENTICAL
    64-bit hash (floor-division index math composes exactly), while a
    genuinely different image differs; bit packing is checked against
    a python reference; poison contract holds."""
    import numpy as np

    from clinvar_ingest_spark.functions.multimodal import (
        extract_image_dhash,
        image_dhash,
        resize_nearest,
    )
    from clinvar_ingest_spark.functions.png import encode_png

    w, h, c = 12, 6, 3
    px = ((np.arange(w * h * c, dtype=np.int64) * 37 + 11) % 256).astype(
        np.uint8
    )
    png = encode_png(w, h, px.tobytes(), c)
    d1 = image_dhash(png)
    assert d1["kind"] == "png"
    # python reference: gray -> 9x8 nearest -> gradient bits
    gray = px.reshape(h, w, c).astype(np.int64).sum(axis=2) // c
    rs = np.array(
        [
            [gray[y * h // 8][x * w // 9] for x in range(9)]
            for y in range(8)
        ]
    )
    hi = lo = 0
    for y in range(8):
        for x in range(8):
            if rs[y][x + 1] > rs[y][x]:
                pos = y * 8 + x
                if pos >= 32:
                    hi |= 1 << (pos - 32)
                else:
                    lo |= 1 << pos
    assert (d1["dhash_hi"], d1["dhash_lo"]) == (hi, lo)
    # 2x nearest upscale: same picture, same hash
    up = resize_nearest(
        {"width": w, "height": h, "channels": c, "pixels": px.tobytes()},
        2 * w,
        2 * h,
    )
    png_up = encode_png(2 * w, 2 * h, up["pixels"], c)
    d2 = image_dhash(png_up)
    assert (d2["dhash_hi"], d2["dhash_lo"]) == (hi, lo)
    # a different image differs
    other = encode_png(w, h, px[::-1].copy().tobytes(), c)
    d3 = image_dhash(other)
    assert (d3["dhash_hi"], d3["dhash_lo"]) != (hi, lo)
    assert image_dhash(b"junk")["kind"] == "opaque"
    assert image_dhash(png[:20])["kind"] == "corrupt"

    df = spark.createDataFrame(
        [(1, png), (2, png_up), (3, other)], "doc_id long, payload binary"
    )
    rows = {
        r["doc_id"]: (r["dhash_hi"], r["dhash_lo"])
        for r in extract_image_dhash(df).collect()
    }
    assert rows[1] == rows[2] == (hi, lo) and rows[3] != rows[1]
