"""Property tests for the stdlib image codecs (benchmark_spark/llm/
codecs.py) — the round-8 real-decode kernels — plus Spark-side checks
for the registered decode/resize/video queries.

Codec properties are pure Python (no Spark): encode->decode identity
over random dimensions and pixels for all three formats, PNG decode of
all five filter types (which our encoder never emits), CRC rejection,
BMP padding edge cases, and video container framing.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from benchmark_spark.llm import codecs

SF_SMOKE = "/root/testdata/sf0.001"


@st.composite
def images(draw, max_dim=12):
    w = draw(st.integers(1, max_dim))
    h = draw(st.integers(1, max_dim))
    rgb = draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
    return w, h, rgb


@settings(max_examples=60, deadline=None)
@given(images(), st.sampled_from(["ppm", "bmp", "png"]))
def test_roundtrip_identity(img, fmt):
    w, h, rgb = img
    assert codecs.decode_image(codecs.encode_image(fmt, w, h, rgb)) == (fmt, w, h, rgb)


@settings(max_examples=30, deadline=None)
@given(images(max_dim=9))
def test_png_all_filter_types_decode(img):
    """Our encoder only emits filter 0; a spec-complete decoder must
    reconstruct Sub/Up/Average/Paeth too. Filter each scanline with
    type y%5 using the reference filter definitions and check the
    decoder inverts them."""
    w, h, rgb = img

    def filt(ftype, line, prev, bpp=3):
        out = bytearray([ftype])
        for i, b in enumerate(line):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: codecs._paeth(left, up, ul)}[
                ftype
            ]
            out.append((b - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(3 * w)
    for y in range(h):
        line = rgb[3 * y * w : 3 * (y + 1) * w]
        raw += filt(y % 5, line, prev)
        prev = line
    png = (
        codecs.PNG_SIG
        + codecs._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    assert codecs.decode_png(png) == ("png", w, h, rgb)


def test_png_crc_rejected():
    png = bytearray(codecs.encode_png(2, 2, bytes(12)))
    png[20] ^= 0xFF  # corrupt an IHDR byte; CRC check must fire
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_image(bytes(png))


def test_bmp_row_padding():
    """Widths whose 3*w is not a multiple of 4 exercise row padding."""
    for w in (1, 2, 3, 5, 6, 7):
        rgb = bytes((i * 29) % 256 for i in range(3 * w * 4))
        assert codecs.decode_bmp(codecs.encode_bmp(w, 4, rgb)) == ("bmp", w, 4, rgb)


def test_ppm_comment_and_whitespace_header():
    rgb = bytes(range(18))
    payload = b"P6 # comment\n# another\n  3\t2 \n255\n" + rgb
    assert codecs.decode_ppm(payload) == ("ppm", 3, 2, rgb)


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="unknown image magic"):
        codecs.decode_image(b"\x00\x01\x02\x03garbage")


@settings(max_examples=25, deadline=None)
@given(images(max_dim=9), st.integers(1, 10), st.integers(1, 10))
def test_resize_nearest_neighbor_exact(img, rw, rh):
    w, h, rgb = img
    out = codecs.decode_image(codecs.resize_image(codecs.encode_image("png", w, h, rgb), rw, rh))
    assert out[:3] == ("ppm", rw, rh)
    for y in range(rh):
        for x in range(rw):
            s = 3 * ((y * h // rh) * w + (x * w // rw))
            d = 3 * (y * rw + x)
            assert out[3][d : d + 3] == rgb[s : s + 3]


@settings(max_examples=25, deadline=None)
@given(st.lists(images(max_dim=6), min_size=1, max_size=6), st.integers(1, 5))
def test_video_container_framing_and_sampling(frames, n):
    frames = [(w, h, rgb) for (w, h, rgb) in frames]
    vid = codecs.encode_ppm_video(frames)
    assert codecs.decode_ppm_video(vid) == frames
    sampled = codecs.sample_frames(vid, n)
    assert len(sampled) == n
    total = len(frames)
    expect = [frames[min(i * total // n, total - 1)] for i in range(n)]
    assert [codecs.decode_image(s)[1:] for s in sampled] == expect


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 4),
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=120),
)
def test_wav_roundtrip_identity(channels, rate, samples):
    samples = samples[: len(samples) - len(samples) % channels] or samples[:channels] * channels
    samples = samples if len(samples) % channels == 0 else samples + [0] * (
        channels - len(samples) % channels
    )
    assert codecs.decode_wav(codecs.encode_wav(rate, channels, samples)) == (
        rate,
        channels,
        samples,
    )


def test_wav_skips_extra_chunks_and_rejects_non_pcm():
    wav = codecs.encode_wav(8000, 1, [1, -2, 3])
    # splice an odd-length LIST chunk after fmt (ends at offset 36);
    # the decoder must skip it with word alignment per the RIFF spec
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = wav[:36] + extra + wav[36:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert codecs.decode_wav(spliced) == (8000, 1, [1, -2, 3])
    bad = bytearray(wav)
    bad[20] = 3  # audio_fmt = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        codecs.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"not audio")


def test_decode_queries_smoke(spark):
    """Registered real-decode queries: shapes, format mix, determinism.
    (Value correctness vs the DuckDB oracle is covered by the gate.)"""
    from benchmark_spark.registry import all_specs

    specs = all_specs()
    dec = specs["q_decode_image"].fn(spark, SF_SMOKE)
    rows = {r["doc_id"]: r for r in dec.collect()}
    assert len(rows) == 500
    assert {r["fmt"] for r in rows.values()} == {"ppm", "bmp", "png"}
    for d, r in list(rows.items())[:20]:
        assert (r["width"], r["height"]) == (4 + d % 5, 3 + d % 4)
    rs = specs["q_resize_image"].fn(spark, SF_SMOKE)
    assert rs.filter("width != 8 OR height != 6 OR fmt != 'ppm'").count() == 0
    vf = specs["q_video_frames"].fn(spark, SF_SMOKE)
    assert vf.count() == 1000  # 2 sampled frames per doc
    assert vf.filter("sample_id NOT IN (0, 1)").count() == 0


# --- AVI/MJPG container (round 12) -----------------------------------------


def _mk_avi(n_frames=3, w=16, h=16):
    import numpy as np

    from benchmark_spark.llm import jpeg

    frames = [
        jpeg.encode_jpeg(w, h, bytes(np.full((h, w, 3), 40 + 10 * f, np.uint8)), quality=90)
        for f in range(n_frames)
    ]
    return frames, codecs.encode_avi_mjpeg(w, h, frames)


def test_avi_mjpeg_roundtrip_bit_exact():
    frames, avi = _mk_avi()
    w, h, got = codecs.decode_avi_mjpeg(avi)
    assert (w, h) == (16, 16)
    assert got == frames  # byte-identical JPEG payloads back out


def test_avi_mjpeg_frame_boundaries_word_aligned():
    """RIFF chunks are word-aligned: an odd-length frame payload gets a
    pad byte that must NOT leak into the returned frame bytes."""
    import numpy as np

    from benchmark_spark.llm import jpeg

    f0 = jpeg.encode_jpeg(16, 16, bytes(np.full((16, 16, 3), 50, np.uint8)), quality=90)
    odd = f0 if len(f0) % 2 == 1 else f0 + b"\xd9"  # force odd length
    avi = codecs.encode_avi_mjpeg(16, 16, [odd, f0])
    _w, _h, got = codecs.decode_avi_mjpeg(avi)
    assert got[0] == odd and got[1] == f0
    assert len(avi) % 2 == 0  # container itself stays aligned


def test_avi_mjpeg_corrupt_index_raises():
    import struct

    _frames, avi = _mk_avi()
    bad = bytearray(avi)
    i = avi.index(b"idx1") + 8 + 8  # first entry's dwOffset
    struct.pack_into("<I", bad, i, struct.unpack_from("<I", bad, i)[0] + 2)
    with pytest.raises(ValueError, match="idx1 entry 0"):
        codecs.decode_avi_mjpeg(bytes(bad))


def test_avi_mjpeg_frame_count_mismatch_raises():
    import struct

    _frames, avi = _mk_avi()
    bad = bytearray(avi)
    struct.pack_into("<I", bad, avi.index(b"avih") + 8 + 16, 99)  # dwTotalFrames
    with pytest.raises(ValueError, match="dwTotalFrames"):
        codecs.decode_avi_mjpeg(bytes(bad))


def test_avi_mjpeg_rejects_non_mjpg_stream():
    _frames, avi = _mk_avi()
    bad = avi.replace(b"vidsMJPG", b"vidsRAW ")
    with pytest.raises(ValueError, match="vids/MJPG"):
        codecs.decode_avi_mjpeg(bad)


def test_avi_mjpeg_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        codecs.decode_avi_mjpeg(b"\x00" * 64)


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=6),
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
)
def test_avi_mjpeg_container_roundtrip_property(payloads, w, h):
    """Container-level property (the codec does not inspect frame
    bytes): ANY byte payloads round-trip exactly through mux ->
    parse+index-verify, whatever their lengths' parities — the framing
    math (word alignment, idx1 offsets, dwTotalFrames) holds on
    arbitrary content, not just well-formed JPEGs."""
    avi = codecs.encode_avi_mjpeg(w, h, payloads)
    gw, gh, got = codecs.decode_avi_mjpeg(avi)
    assert (gw, gh) == (w, h)
    assert got == payloads


def test_avi_mjpeg_corrupt_index_fourcc_raises():
    """Round-12 review: the idx1 fourcc bytes are cross-checked against
    the actual movi chunk tags, not discarded."""
    _frames, avi = _mk_avi()
    i = avi.index(b"idx1") + 8  # first entry's fourcc
    bad = avi[:i] + b"01dc" + avi[i + 4 :]
    with pytest.raises(ValueError, match="idx1 entry 0"):
        codecs.decode_avi_mjpeg(bad)


def test_avi_mjpeg_truncation_raises_not_short_frames():
    """Round-12 review: a payload cut short while its RIFF size still
    declares the full length must raise, never return short frames."""
    _frames, avi = _mk_avi()
    with pytest.raises(ValueError, match="truncated RIFF"):
        codecs.decode_avi_mjpeg(avi[: len(avi) - 10])


def test_avi_mjpeg_partial_idx1_entry_raises():
    """ADVICE r12: an idx1 chunk whose declared length is not a
    multiple of 16 holds a trailing partial entry; the decoder must
    report the malformed index loudly instead of reading past the
    chunk end and fabricating a phantom entry."""
    import struct

    _frames, avi = _mk_avi()
    i = avi.index(b"idx1") + 4  # chunk length field
    (length,) = struct.unpack_from("<I", avi, i)
    assert length % 16 == 0 and length >= 16
    bad = bytearray(avi)
    struct.pack_into("<I", bad, i, length - 8)  # leave a half entry
    with pytest.raises(ValueError, match="idx1 length"):
        codecs.decode_avi_mjpeg(bytes(bad))
