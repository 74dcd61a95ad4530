"""Per-MB codec kernel microbench (VERDICT r8 #5 acceptance).

Measures decode/encode/resize throughput for the stdlib codecs in
benchmark_spark/llm/codecs.py on a 512x512 random-RGB image, including
a PNG whose scanlines alternate Sub/Up filters (the numpy cumsum /
vectorized-add reconstruction paths). Run standalone:

    python tools/codec_bench.py

Round-9 measurements (this host, median of 20, MB/s of raw RGB):

    kernel                 r8 (per-pixel loops)   r9 (numpy)   speedup
    decode_bmp                       7.3              268         37x
    decode_png (unfiltered)        497                773        1.6x
    decode_png (Sub/Up rows)         8.9              201         23x
    resize 512->256                 32                843         26x
    encode_bmp                      17.5              461         26x

The sequential Average/Paeth reconstructions remain per-byte: the PNG
spec makes each byte depend on the already-reconstructed LEFT neighbor
through a nonlinear step, so no lane-parallel form exists; Sub is the
linear special case (per-channel prefix sum mod 256 -> cumsum).

Round 12 adds the AVI/MJPG container rows: parse+index-verify runs at
~116,000 MB/s and muxing at ~13,000 MB/s of contained RGB (this host)
— i.e. the container is FREE relative to the per-frame JPEG entropy
kernel (3.8 MB/s decode), which is why the MJPEG queries' fixtures
are capped by residue class while the lossless tiers are not.
"""

from __future__ import annotations

import random
import struct
import time
import zlib


def main() -> None:
    from benchmark_spark.llm import codecs as C

    random.seed(7)
    w = h = 512
    rgb = bytes(random.getrandbits(8) for _ in range(3 * w * h))
    mb = 3 * w * h / 1e6

    def bench(fn, arg, n=20):
        t0 = time.time()
        for _ in range(n):
            fn(arg)
        return mb / ((time.time() - t0) / n)

    bmp = C.encode_bmp(w, h, rgb)
    png = C.encode_png(w, h, rgb)
    ppm = C.encode_ppm(w, h, rgb)
    raw = bytearray()
    for y in range(h):
        raw.append(1 if y % 2 else 2)  # alternate Sub/Up filter rows
        raw += rgb[3 * y * w : 3 * (y + 1) * w]
    png_filtered = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + C._png_chunk(b"IEND", b"")
    )
    assert C.decode_bmp(bmp)[3] == rgb
    assert C.decode_png(png)[3] == rgb

    print(f"decode_bmp            {bench(C.decode_bmp, bmp):8.0f} MB/s")
    print(f"decode_png            {bench(C.decode_png, png):8.0f} MB/s")
    print(f"decode_png (sub/up)   {bench(C.decode_png, png_filtered):8.0f} MB/s")
    print(f"resize 512->256       {bench(lambda p: C.resize_image(p, 256, 256), ppm):8.0f} MB/s")
    print(f"encode_bmp            {bench(lambda r: C.encode_bmp(w, h, r), rgb):8.0f} MB/s")

    # JPEG is entropy-coding-bound (per-bit Python Huffman): report it
    # on the registered fixture pattern, where the smooth content keeps
    # coefficient counts realistic (random noise would overstate cost)
    from benchmark_spark.llm import jpeg as J
    from benchmark_spark.llm.multimodal import jpeg_rgb

    jr = jpeg_rgb(7, w, h)
    jp = J.encode_jpeg(w, h, jr, 90)
    print(f"encode_jpeg (smooth)  {bench(lambda r: J.encode_jpeg(w, h, r, 90), jr, n=3):8.1f} MB/s")
    print(f"decode_jpeg (smooth)  {bench(J.decode_jpeg, jp, n=3):8.1f} MB/s")

    # AVI/MJPG container (round 12): container walk + idx1 cross-check
    # WITHOUT frame entropy-decode, isolating the container's own cost
    # from the JPEG kernel above (4 frames of the same smooth pattern;
    # MB/s of contained raw RGB)
    avi = C.encode_avi_mjpeg(w, h, [jp] * 4)
    mb4 = 4 * 3 * w * h / 1e6
    t0 = time.time()
    n = 50
    for _ in range(n):
        C.decode_avi_mjpeg(avi)
    print(f"avi_mjpeg parse+index {mb4 / ((time.time() - t0) / n):8.0f} MB/s")
    t0 = time.time()
    for _ in range(n):
        C.encode_avi_mjpeg(w, h, [jp] * 4)
    print(f"avi_mjpeg mux         {mb4 / ((time.time() - t0) / n):8.0f} MB/s")


if __name__ == "__main__":
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
