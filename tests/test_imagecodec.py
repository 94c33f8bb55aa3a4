"""Real image decode/resize (pure-stdlib codec, no PIL in the container).

Local kernel correctness (PNG all five scanline filters, gray/palette
color types, BMP + PPM roundtrips, nearest-neighbor resize identity)
plus the Spark mapInPandas operators running the REAL path end-to-end
over mixed-format payloads.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import types as T

from nacc_form_validator_spark.operators.imagecodec import (
    ImageDecodeError, decode_bmp, decode_image, decode_png, decode_ppm,
    encode_bmp, encode_png, image_feature, resize_nearest, sniff_mime)
from nacc_form_validator_spark.operators.multimodal import (
    decode_image_batch, resize_image_batch)


def _img(h=13, w=17, seed=3):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8)


def _png_chunks(w, h, raw, ctype=2, extra=b""):
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _forward_filter(img, ftypes):
    """Apply PNG scanline filters forward (RFC 2083 6.2-6.6) so the
    decoder's unfilter must invert every filter type."""
    h, w, _ = img.shape
    stride, bpp = w * 3, 3
    rows = img.reshape(h, stride).astype(np.int16)
    out, prior = [], np.zeros(stride, np.int16)
    for y in range(h):
        ft, cur = ftypes[y % len(ftypes)], rows[y]
        f = np.empty(stride, np.int16)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
            f[x] = (cur[x] - pred) & 0xFF
        out.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prior = cur
    return b"".join(out)


def test_png_roundtrip_and_all_filters():
    img = _img()
    assert np.array_equal(decode_png(encode_png(img)), img)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(_png_chunks(17, 13, raw)), img)


def test_png_gray_and_palette():
    g = _img(5, 7)[:, :, :1]
    raw = b"".join(b"\x00" + bytes(g[y, :, 0]) for y in range(5))
    got = decode_png(_png_chunks(7, 5, raw, ctype=0))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # palette: 4 colors, 2x2
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body)))
    raw = b"\x00\x00\x01" + b"\x00\x02\x03"
    data = _png_chunks(2, 2, raw, ctype=3, extra=chunk(b"PLTE", plte))
    got = decode_png(data)
    assert got.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [9, 9, 9]]]


def test_bmp_ppm_roundtrip_and_sniff():
    img = _img()
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    ppm = b"P6\n# c\n17 13\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(ppm), img)
    assert sniff_mime(encode_png(img)) == "image/png"
    assert sniff_mime(encode_bmp(img)) == "image/bmp"
    # JPEG now dispatches to the real baseline decoder, which rejects a
    # truncated/garbage stream as a decode error (not NotImplemented)
    with pytest.raises(ImageDecodeError):
        decode_image(b"\xff\xd8\xff rest")
    with pytest.raises(ImageDecodeError):
        decode_png(b"not a png at all")


def test_resize_nearest():
    img = _img()
    assert np.array_equal(resize_nearest(img, 17, 13), img)
    assert resize_nearest(img, 8, 8).shape == (8, 8, 3)
    # upscale duplicates pixels, never interpolates new values
    up = resize_nearest(img, 34, 26)
    assert set(np.unique(up)) <= set(np.unique(img))


def _payload_df(spark):
    imgs = {f"img://{i}": _img(5 + i, 6 + i, seed=i) for i in range(6)}
    rows = []
    for i, (url, arr) in enumerate(sorted(imgs.items())):
        if i % 3 == 0:
            payload = encode_png(arr)
        elif i % 3 == 1:
            payload = encode_bmp(arr)
        else:
            payload = (b"P6\n%d %d\n255\n" %
                       (arr.shape[1], arr.shape[0])) + arr.tobytes()
        rows.append((url, bytearray(payload)))
    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("img", T.BinaryType())])
    return spark.createDataFrame(rows, schema), imgs


def test_spark_real_decode_features(spark):
    df, imgs = _payload_df(spark)
    out = decode_image_batch(df, bin_col="img", deterministic_fake=False)
    got = {r["url"]: r["feature"] for r in out.collect()}
    assert got.keys() == imgs.keys()
    for url, arr in imgs.items():
        want = image_feature(arr)
        assert got[url] == pytest.approx(want, abs=1e-5), url


def test_spark_real_resize_roundtrip(spark):
    df, imgs = _payload_df(spark)
    out = resize_image_batch(df, bin_col="img", width=8, height=9,
                             deterministic_fake=False)
    for r in out.collect():
        assert (r["width"], r["height"]) == (8, 9)
        dec = decode_png(bytes(r["resized"]))
        want = resize_nearest(imgs[r["url"]], 8, 9)
        assert np.array_equal(dec, want), r["url"]


# ----------------------------------------------------------------- JPEG --
def test_jpeg_flat_blocks_lossless():
    """Unit quantization + flat 8x8 blocks: DCT is DC-only and exact,
    so baseline JPEG round-trips losslessly (the oracle's invariant)."""
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_gray)
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, (3, 4))
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img))
    assert out.shape == (24, 32, 3)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 1], img)  # gray replicated


def test_jpeg_noise_roundtrip_tolerance():
    """Arbitrary content with q=1: only float DCT/IDCT rounding, so the
    round-trip error is at most 1 LSB gray / 2 LSB after YCbCr."""
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_gray, encode_jpeg_rgb)
    rng = np.random.RandomState(12)
    g = rng.randint(0, 256, (16, 40)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg_gray(g))[:, :, 0]
    assert np.abs(dg.astype(int) - g.astype(int)).max() <= 1
    c = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    dc = decode_jpeg(encode_jpeg_rgb(c))
    assert np.abs(dc.astype(int) - c.astype(int)).max() <= 2


def test_jpeg_quant_lossy_but_bounded():
    """A real quantization table is lossy; error stays bounded by the
    quant step energy (coarse sanity that dequantization multiplies)."""
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_gray)
    rng = np.random.RandomState(13)
    g = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    q = np.clip(np.arange(64) + 2, 2, 40)
    d = decode_jpeg(encode_jpeg_gray(g, quant=q))[:, :, 0]
    err = np.abs(d.astype(int) - g.astype(int)).max()
    assert 0 < err < 128  # lossy, but decodes in range


def test_jpeg_restart_intervals_value_identical():
    """DRI/RSTn: restart markers reset DC prediction and byte-align; the
    decoded image must be identical for any interval."""
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_gray)
    rng = np.random.RandomState(14)
    g = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_gray(g))
    for ri in (1, 2, 3, 7):
        out = decode_jpeg(encode_jpeg_gray(g, restart_interval=ri))
        assert np.array_equal(out, base), f"interval {ri}"


def test_jpeg_420_subsampling():
    """4:2:0: luma full-res (2x2 blocks per MCU), chroma box-averaged;
    gray content (flat chroma) must survive within rounding, and flat
    color exactly."""
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_rgb)
    rng = np.random.RandomState(15)
    g = rng.randint(0, 256, (32, 48)).astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    out = decode_jpeg(encode_jpeg_rgb(img, subsample=True))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    flat = np.full((16, 16, 3), (12, 200, 77), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_rgb(flat, subsample=True)), flat)


def test_jpeg_progressive_rejected():
    """Progressive (SOF2) stays an honest error, not a wrong answer."""
    from nacc_form_validator_spark.operators.imagecodec import (
        ImageDecodeError)
    from nacc_form_validator_spark.operators.jpegcodec import decode_jpeg
    bad = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + bytes(9)
    with pytest.raises(ImageDecodeError, match="baseline"):
        decode_jpeg(bad)


def test_jpeg_dispatch_and_sniff():
    from nacc_form_validator_spark.operators.imagecodec import (
        decode_image, sniff_mime)
    from nacc_form_validator_spark.operators.jpegcodec import (
        encode_jpeg_gray)
    img = np.full((8, 8), 99, dtype=np.uint8)
    jp = encode_jpeg_gray(img)
    assert sniff_mime(jp) == "image/jpeg"
    assert np.array_equal(decode_image(jp)[:, :, 0], img)


def test_bitreader_stuffed_pad_before_restart():
    """The byte-aligned pad byte before an RSTn may be 0xFF (emitted as
    stuffed FF 00); align_restart must consume the stuffing and the
    marker, not decode the pad byte as entropy data."""
    from nacc_form_validator_spark.operators.jpegcodec import _BitReader
    data = bytes([0x12, 0x34, 0x56, 0x78,   # entropy (buffered whole)
                  0xFF, 0x00,               # stuffed 0xFF pad byte
                  0xFF, 0xD1,               # RST1
                  0x9A, 0xFF, 0xD9])        # next interval + EOI
    br = _BitReader(data, 0)
    assert [br.bits(8) for _ in range(4)] == [0x12, 0x34, 0x56, 0x78]
    br.align_restart()
    assert br.marker is None
    assert br.bits(8) == 0x9A


def test_bitreader_truncated_scan_implicit_eoi():
    """A truncated entropy segment (no terminating marker) must read as
    an implicit EOI, never IndexError — crawl payloads are frequently
    cut short."""
    from nacc_form_validator_spark.operators.jpegcodec import _BitReader
    for data in (bytes([0xAB]), bytes([0xAB, 0xFF]), b""):
        br = _BitReader(data, 0)
        vals = [br.bits(8) for _ in range(6)]   # reads past the end
        assert br.marker == 0xD9
        if data:
            assert vals[0] == 0xAB


def test_jpeg_truncated_payload_no_crash():
    """decode_jpeg on a JPEG cut inside the scan either finishes (zero
    bits pad the tail) or raises ImageDecodeError — never IndexError."""
    import pytest

    from nacc_form_validator_spark.operators.imagecodec import (
        ImageDecodeError)
    from nacc_form_validator_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_gray)
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    full = encode_jpeg_gray(g)
    for cut in (3, 5, 9, 17, 33):
        data = full[:-cut]
        try:
            out = decode_jpeg(data)
            assert out.shape == (16, 16, 3)
        except ImageDecodeError:
            pass


# ---------------------------------------------------------------- GIF
def test_gif_roundtrip_arbitrary_palette():
    import numpy as np

    from nacc_form_validator_spark.operators.imagecodec import (
        decode_image, encode_gif, sniff_mime)
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 256, (37, 23)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    g = encode_gif(idx, pal)
    assert sniff_mime(g) == "image/gif"
    assert np.array_equal(decode_image(g), pal[idx])


def test_gif_interlace_and_runs():
    """4-pass interlace plus a run-heavy image (deep LZW table growth
    with mid-stream clears — > 4096 table entries)."""
    import numpy as np

    from nacc_form_validator_spark.operators.imagecodec import (
        decode_gif, encode_gif)
    rng = np.random.RandomState(9)
    idx = np.repeat(rng.randint(0, 256, (64, 8)).astype(np.uint8),
                    16, axis=1)           # 64x128, long runs
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])
    assert np.array_equal(
        decode_gif(encode_gif(idx, pal, interlace=True)), pal[idx])


def test_gif_small_palette_and_extensions():
    """A 2-bit-palette GIF with a graphic-control extension spliced in
    front of the image block — the shape real 89a encoders emit."""
    import struct

    import numpy as np

    from nacc_form_validator_spark.operators.imagecodec import (
        decode_gif, encode_gif)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    g = bytearray(encode_gif(idx, pal))
    # splice a GCE (0x21 0xF9, one 4-byte sub-block) before the image
    img_at = g.index(0x2C, 13)
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(g[:img_at]) + gce + bytes(g[img_at:])
    assert np.array_equal(decode_gif(spliced), pal[idx])


def test_gif_rejects_truncation_and_garbage():
    import numpy as np
    import pytest

    from nacc_form_validator_spark.operators.imagecodec import (
        ImageDecodeError, decode_gif, encode_gif)
    with pytest.raises(ImageDecodeError):
        decode_gif(b"NOTAGIF")
    pal = np.zeros((256, 3), dtype=np.uint8)
    g = encode_gif(np.zeros((8, 8), dtype=np.uint8), pal)
    with pytest.raises(ImageDecodeError):
        decode_gif(g[:20])
