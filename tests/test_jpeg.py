"""Baseline JPEG codec pins (benchmark_spark/llm/jpeg.py, VERDICT r8
missing #2): determinism, tolerance bounds on the smooth fixture
patterns, exactness on constant blocks, the ZRL/stuffing code paths,
and structural rejection of non-baseline streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from benchmark_spark.llm import jpeg as J
from benchmark_spark.llm.multimodal import _JPEG_MAX_ERR, jpeg_dims, jpeg_rgb


def _err(rgb: bytes, out: bytes) -> np.ndarray:
    return np.abs(
        np.frombuffer(rgb, np.uint8).astype(int) - np.frombuffer(out, np.uint8).astype(int)
    )


def test_encoder_is_deterministic():
    rgb = jpeg_rgb(7, *jpeg_dims(7))
    w, h = jpeg_dims(7)
    assert J.encode_jpeg(w, h, rgb, 90) == J.encode_jpeg(w, h, rgb, 90)


def test_fixture_patterns_within_registered_tolerance():
    """The registered query's verdict bound, proven over the full dims
    cycle (9x7 = 63 distinct shapes) and the whole doc_id%64 range."""
    worst = 0
    for d in range(64):
        w, h = jpeg_dims(d)
        rgb = jpeg_rgb(d, w, h)
        fmt, dw, dh, out = J.decode_jpeg(J.encode_jpeg(w, h, rgb, 90))
        assert (fmt, dw, dh) == ("jpeg", w, h)
        worst = max(worst, int(_err(rgb, out).max()))
    assert worst <= _JPEG_MAX_ERR, f"fixture error {worst} exceeds the verdict bound"


def test_constant_blocks_roundtrip_exactly():
    rgb = bytes([77, 144, 201]) * 64 * 64
    _, _, _, out = J.decode_jpeg(J.encode_jpeg(64, 64, rgb, 90))
    assert out == rgb


def test_compresses_smooth_content():
    w, h = 64, 64
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    plane = np.stack([x * 2 + y, x + y * 2, x + y], axis=-1).astype(np.uint8).tobytes()
    payload = J.encode_jpeg(w, h, plane, 90)
    assert len(payload) < len(plane) / 4, "smooth content must compress"


def test_zrl_and_stuffing_paths_decode():
    """A single bright pixel on black produces long zero runs (ZRL
    escapes) and, over a seed sweep, entropy bytes equal to 0xFF
    (exercising the 0x00 stuffing on write and its strip on read)."""
    w = h = 16
    base = bytearray(3 * w * h)
    base[3 * (5 * w + 9)] = 255  # lone spike -> high-frequency ACs
    payload = J.encode_jpeg(w, h, bytes(base), 90)
    _, dw, dh, out = J.decode_jpeg(payload)
    assert (dw, dh) == (w, h) and len(out) == 3 * w * h
    # find a seed whose entropy segment contains a stuffed 0xFF00
    rng = np.random.default_rng(0)
    for _ in range(50):
        rgb = rng.integers(0, 256, 3 * w * h, dtype=np.uint8).tobytes()
        p = J.encode_jpeg(w, h, rgb, 90)
        if b"\xff\x00" in p:
            _, dw, dh, out = J.decode_jpeg(p)
            assert (dw, dh) == (w, h) and len(out) == 3 * w * h
            break
    else:
        pytest.fail("no stuffed byte produced across 50 random images")


def test_edge_padding_does_not_bleed():
    """Non-multiple-of-8 dims: padding is edge replication, and the
    decoder crops back to the SOF dims exactly."""
    w, h = 19, 13
    rgb = jpeg_rgb(11, w, h)
    _, dw, dh, out = J.decode_jpeg(J.encode_jpeg(w, h, rgb, 90))
    assert (dw, dh) == (w, h)
    assert len(out) == 3 * w * h
    assert int(_err(rgb, out).max()) <= _JPEG_MAX_ERR


def test_rejects_non_baseline_and_garbage():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg at all")
    w, h = jpeg_dims(1)
    payload = bytearray(J.encode_jpeg(w, h, jpeg_rgb(1, w, h), 90))
    sof = bytes(payload).find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rebrand SOF0 as progressive SOF2
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):  # truncated entropy data
        J.decode_jpeg(J.encode_jpeg(w, h, jpeg_rgb(1, w, h), 90)[:-40])


def test_quality_moves_size_and_error():
    w, h = 24, 24
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, 3 * w * h, dtype=np.uint8).tobytes()
    p90 = J.encode_jpeg(w, h, rgb, 90)
    p20 = J.encode_jpeg(w, h, rgb, 20)
    assert len(p20) < len(p90)
    e90 = _err(rgb, J.decode_jpeg(p90)[3]).mean()
    e20 = _err(rgb, J.decode_jpeg(p20)[3]).mean()
    assert e20 > e90


def test_decoder_resolves_components_by_id_not_position():
    """Generality beyond our own encoder: component ids are arbitrary
    per T.81 — only the SOF<->SOS id linkage matters. Relabel the ids
    1,2,3 -> 7,8,9 consistently in both headers; a decoder that
    assumed fixed ids (or positional identity) would reject or
    mis-map the stream, ours must reproduce the identical image."""
    w, h = 16, 16
    rgb = jpeg_rgb(9, w, h)
    baseline = J.decode_jpeg(J.encode_jpeg(w, h, rgb, 90))[3]
    payload = bytearray(J.encode_jpeg(w, h, rgb, 90))
    sof = bytes(payload).find(b"\xff\xc0")
    for c in range(3):
        off = sof + 4 + 6 + 3 * c  # 2 marker + 2 len + 6 frame header
        assert payload[off] == c + 1
        payload[off] = c + 7
    sos = bytes(payload).find(b"\xff\xda")
    for c in range(3):
        off = sos + 5 + 2 * c  # 2 marker + 2 len + 1 ns
        assert payload[off] == c + 1
        payload[off] = c + 7
    out = J.decode_jpeg(bytes(payload))[3]
    assert out == baseline


EXPECTED_444_SHA = "f75435716d99cd01c86156d2fc287878c302a205c85dd319d6e87daa15cfa9fb"


def test_420_roundtrip_within_tolerance_and_edge_mcus():
    """4:2:0 with restart markers: odd (non-multiple-of-16) dims force
    edge MCUs whose padding must not bleed; reconstruction of the
    smooth fixture patterns stays inside the registered bounds."""
    from benchmark_spark.llm.multimodal import (
        _JPEG420_MAX_ERR,
        _JPEG420_MEAN_CENTI,
        jpeg_rgb,
    )

    for d, (w, h) in [(3, (17, 13)), (11, (24, 22)), (40, (16, 16)), (5, (33, 18))]:
        src = jpeg_rgb(d, w, h)
        enc = J.encode_jpeg(w, h, src, 90, subsampling="4:2:0", restart_interval=2)
        fmt, dw, dh, out = J.decode_jpeg(enc)
        assert (dw, dh) == (w, h)
        err = np.abs(
            np.frombuffer(out, np.uint8).astype(np.int64)
            - np.frombuffer(src, np.uint8).astype(np.int64)
        )
        assert err.max() <= _JPEG420_MAX_ERR
        assert err.mean() * 100 <= _JPEG420_MEAN_CENTI


def test_420_restart_count_and_dc_reset():
    """The entropy segment carries exactly (MCUs-1)//interval RSTm
    markers with m cycling 0..7, and the stream decodes identically
    with interval 1 and no interval (predictor reset is lossless)."""
    from benchmark_spark.llm.multimodal import jpeg_rgb

    w, h = 64, 33  # 4 x 3 MCUs = 12
    src = jpeg_rgb(21, w, h)
    enc = J.encode_jpeg(w, h, src, 90, subsampling="4:2:0", restart_interval=2)
    import struct

    sos = enc.index(b"\xff\xda")
    (seg_len,) = struct.unpack_from(">H", enc, sos + 2)
    entropy = enc[sos + 2 + seg_len : enc.rfind(b"\xff\xd9")]
    rsts = [i & 7 for i in range(8) for _ in range(entropy.count(bytes([0xFF, 0xD0 + i])))]
    assert len(rsts) == (12 - 1) // 2  # 5 markers
    no_rst = J.decode_jpeg(J.encode_jpeg(w, h, src, 90, subsampling="4:2:0"))[3]
    every = J.decode_jpeg(
        J.encode_jpeg(w, h, src, 90, subsampling="4:2:0", restart_interval=1)
    )[3]
    assert no_rst == every  # restarts change framing, not pixels


def test_420_resync_rejects_skewed_restart_index():
    """A decoder that did not track the modulo-8 restart index would
    silently mis-splice a torn entropy segment; ours raises."""
    from benchmark_spark.llm.multimodal import jpeg_rgb

    enc = J.encode_jpeg(17, 13, jpeg_rgb(3, 17, 13), 90,
                        subsampling="4:2:0", restart_interval=1)
    bad = enc.replace(b"\xff\xd0", b"\xff\xd3")
    assert bad != enc
    with pytest.raises(ValueError, match="expected RST"):
        J.decode_jpeg(bad)


def test_444_bytes_unchanged_by_420_support():
    """The widened encoder's default 4:4:4 output is byte-stable
    (regression pin for the subsampling refactor): golden prefix of
    the d=7 24x22 fixture, captured before the refactor."""
    from benchmark_spark.llm.multimodal import jpeg_rgb

    enc = J.encode_jpeg(24, 22, jpeg_rgb(7, 24, 22), 90)
    import hashlib

    assert hashlib.sha256(enc).hexdigest() == EXPECTED_444_SHA



def test_split_decode_is_byte_identical_and_order_independent():
    """Restart strips decode independently: decode_jpeg_split equals
    the sequential decoder byte-for-byte across subsamplings and
    intervals, strips are recoverable by pure byte scan, and decoding
    them in REVERSE order yields the same planes (true independence —
    no hidden cross-strip state)."""
    from benchmark_spark.llm.multimodal import jpeg_rgb

    w, h = 120, 90
    src = jpeg_rgb(13, w, h)
    for sub in ("4:4:4", "4:2:0"):
        for ri in (1, 3, 7):
            enc = J.encode_jpeg(w, h, src, 85, subsampling=sub, restart_interval=ri)
            assert J.decode_jpeg_split(enc) == J.decode_jpeg(enc)
    # order independence, by hand: run the strip loop reversed
    import numpy as np

    enc = J.encode_jpeg(w, h, src, 85, subsampling="4:2:0", restart_interval=3)
    hdr = J._parse_headers(enc)
    mcux, mcuy, grid = J._geometry(hdr)
    n_mcus = mcux * mcuy
    ri = hdr["restart_interval"]
    strips = J.split_entropy_segments(hdr["entropy"])
    zz = {c: np.zeros((gh * gw, 64), dtype=np.int64) for c, (gh, gw) in grid.items()}
    for si in reversed(range(len(strips))):
        J._decode_mcu_run(
            J._BitReader(strips[si]), hdr, grid, zz,
            mcux, si * ri, min((si + 1) * ri, n_mcus),
        )
    assert J._reconstruct(hdr, grid, zz) == J.decode_jpeg(enc)


def test_split_decode_requires_restart_markers():
    from benchmark_spark.llm.multimodal import jpeg_rgb

    enc = J.encode_jpeg(32, 32, jpeg_rgb(1, 32, 32), 85)
    with pytest.raises(ValueError, match="no restart markers"):
        J.decode_jpeg_split(enc)


def test_progressive_equals_baseline_decode():
    """Spectral-selection progressive reorganizes the SAME quantized
    coefficients, so its decode must be BYTE-IDENTICAL to the baseline
    decode of the same image — across dims, band scripts, qualities."""
    from benchmark_spark.llm.multimodal import jpeg_dims, jpeg_rgb

    for d in (0, 3, 13, 101):
        w, h = jpeg_dims(d)
        src = jpeg_rgb(d, w, h)
        base = J.decode_jpeg(J.encode_jpeg(w, h, src, 90))
        prog = J.encode_jpeg_progressive(w, h, src, 90)
        assert J._is_progressive(prog) and not J._is_progressive(
            J.encode_jpeg(w, h, src, 90)
        )
        assert J.decode_jpeg(prog) == base
    # odd dims + a three-band script + single full band
    for dims, bands in (((33, 17), ((1, 2), (3, 9), (10, 63))), ((120, 90), ((1, 63),))):
        w, h = dims
        src = jpeg_rgb(5, w, h)
        assert J.decode_jpeg(J.encode_jpeg_progressive(w, h, src, 85, bands=bands)) \
            == J.decode_jpeg(J.encode_jpeg(w, h, src, 85))


def test_progressive_eobn_run_decodes():
    """General EOBn (n >= 1) end-of-band runs — which the Annex-K
    encoder can't emit (no EOBn symbols in the baseline tables) — via
    a hand-built scan with a CUSTOM Huffman table: EOB1 + 1 extension
    bit covers three trailing blocks in one symbol."""
    import struct

    import numpy as np

    w = h = 16  # 2x2 blocks at 4:4:4? 16x16 -> 4 blocks per component
    # custom AC table: 0x10 (EOB1) -> '00', 0x01 -> '01', 0x00 -> '100'
    bits = [0, 2, 1] + [0] * 13
    vals = [0x10, 0x01, 0x00]
    enc = J._canonical_codes(bits, vals)
    # DC scan: all-zero DCs with the standard tables (diff category 0)
    dcl = J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    dcc = J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    wdc = J._BitWriter()
    for _b in range(4):
        for comp in range(3):
            code, ln = (dcl if comp == 0 else dcc)[0]
            wdc.write(code, ln)
    # luma AC scan, band 1..63: block0 has zz[1] = +1 (symbol 0x01 +
    # sign bit 1), then EOB0 for the rest of its band; block1 emits
    # EOB1 with extension bit 1 -> run of 3: blocks 1,2,3 all done
    wac = J._BitWriter()
    c, ln = enc[0x01]; wac.write(c, ln); wac.write(1, 1)
    c, ln = enc[0x00]; wac.write(c, ln)
    c, ln = enc[0x10]; wac.write(c, ln); wac.write(1, 1)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    qt = np.full((8, 8), 16, dtype=np.int64)  # dequant 1 -> 16: visible ripple
    payload = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qt.reshape(64)[J.ZIGZAG]))
        + seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
        + seg(0xFFC4, bytes([0x01]) + bytes(J.DC_CHROMA_BITS) + bytes(J.DC_CHROMA_VALS))
        + seg(0xFFC4, bytes([0x12]) + bytes(bits) + bytes(vals))  # AC table 2
        + seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0])) + wdc.flush()
        + seg(0xFFDA, bytes([1, 1, 0x02, 1, 63, 0])) + wac.flush()
        + b"\xff\xd9"
    )
    fmt, dw, dh, rgb = J.decode_jpeg(payload)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(rgb, np.uint8).astype(np.int64).reshape(h, w, 3)
    # expected: all coefficients zero except luma block0 zz[1] = 1
    # (natural index 1 = horizontal AC) -> Y = 128 + IDCT of that one
    # coefficient in the top-left block; other blocks flat 128 gray
    flat = got[:, 8:, :]  # right half: blocks 1 and 3 are flat
    assert flat.std() == 0
    assert got[8:, :8, :].std() == 0  # block 2 flat
    assert got[:8, :8, :].std() > 0  # block 0 carries the AC ripple


def test_successive_approximation_equals_baseline_decode():
    """Full successive approximation (the libjpeg-default profile):
    first passes at Al=1, then DC raw-bit refinement and AC refinement
    scans deliver the final precision bit — the fully-refined decode
    is BYTE-IDENTICAL to the baseline decode of the same image, on
    content mixing noise (dense corrections), flat areas (long zero
    runs / ZRL-in-refine), and smooth gradients, at three qualities."""
    for seed in (0, 5, 9):
        rng = np.random.RandomState(seed)
        w, h = 64 + seed * 8, 48 + seed * 5
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        smooth = (x * 2 + y * 3) % 200
        noise = rng.randint(0, 256, (h, w))
        flat = np.full((h, w), 128)
        sel = (x // 16 + y // 16) % 3
        gray = np.where(sel == 0, smooth, np.where(sel == 1, noise, flat)).astype(
            np.uint8
        )
        rgb = (
            np.stack([gray, 255 - gray, (gray * 3) % 256], axis=-1)
            .astype(np.uint8)
            .tobytes()
        )
        for q in (25, 50, 90):
            base = J.decode_jpeg(J.encode_jpeg(w, h, rgb, q))
            sa = J.decode_jpeg(
                J.encode_jpeg_progressive(w, h, rgb, q, successive=True)
            )
            assert sa == base, (seed, q)
    # the SA script emits 14 scans with the default two bands
    from benchmark_spark.llm.multimodal import jpeg_rgb

    enc = J.encode_jpeg_progressive(17, 13, jpeg_rgb(3, 17, 13), 90, successive=True)
    assert enc.count(b"\xff\xda") == 14


def test_progressive_restart_markers_roundtrip():
    """Round 11 (VERDICT r10 #5): progressive scans carry DRI/RSTn.
    Three claims: (1) a restart-marked progressive stream decodes
    byte-identically to the unmarked one (markers reorganize entropy
    coding only); (2) the split decoder — every scan's strips decoded
    INDEPENDENTLY, reverse order — matches the sequential decode
    byte-for-byte; (3) the marker count is exactly
    n_scans * (ceil(n_units / ri) - 1). Interval cases: ri dividing
    the block count exactly, not dividing, and ri=1 (a marker between
    every pair of blocks)."""
    rng = np.random.RandomState(11)
    w, h = 40, 48  # 5x6 = 30 blocks
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8).tobytes()
    for succ in (False, True):
        plain = J.encode_jpeg_progressive(w, h, rgb, 80, successive=succ)
        want = J.decode_jpeg(plain)
        n_scans = plain.count(b"\xff\xda")
        for ri in (1, 5, 7):  # 30 % 5 == 0; 30 % 7 != 0; ri=1 extreme
            marked = J.encode_jpeg_progressive(
                w, h, rgb, 80, successive=succ, restart_interval=ri
            )
            assert J.decode_jpeg(marked) == want, (succ, ri)
            assert J.decode_jpeg_progressive_split(marked) == want, (succ, ri)
            n_rst = sum(
                1
                for i in range(len(marked) - 1)
                if marked[i] == 0xFF and 0xD0 <= marked[i + 1] <= 0xD7
            )
            assert n_rst == n_scans * (-(-30 // ri) - 1), (succ, ri)


def test_progressive_split_requires_restart_markers():
    """Mirror of the baseline split guard: splitting a progressive
    stream without DRI is an explicit error, not a silent whole-image
    'strip'."""
    rgb = bytes(range(256)) * (3 * 24 * 24 // 256 + 1)
    enc = J.encode_jpeg_progressive(24, 24, rgb[: 3 * 24 * 24], 90)
    with pytest.raises(ValueError, match="no restart markers"):
        J.decode_jpeg_progressive_split(enc)


def test_progressive_restart_resync_rejects_wrong_marker_index():
    """E.1.4's modulo-8 restart index is load-bearing: corrupt the
    first RSTm in the stream to the WRONG index and the sequential
    decoder must refuse to resync (a skipped/duplicated segment in a
    corrupt file must not silently shift every later block)."""
    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8).tobytes()
    enc = bytearray(
        J.encode_jpeg_progressive(24, 24, rgb, 85, restart_interval=2)
    )
    for i in range(2, len(enc) - 1):
        if enc[i] == 0xFF and enc[i + 1] == 0xD0:
            enc[i + 1] = 0xD5  # expected RST0, found RST5
            break
    with pytest.raises(ValueError, match="expected RST0"):
        J.decode_jpeg(bytes(enc))
