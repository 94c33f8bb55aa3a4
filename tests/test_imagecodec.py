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
    with pytest.raises(NotImplementedError, match="jpeg"):
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
