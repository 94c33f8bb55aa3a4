"""Pure-stdlib/numpy image codec for the multimodal operators.

No PIL/ffmpeg in this environment, so the decode kernels implement the
public container formats directly:

- PNG (RFC 2083): chunk walk, zlib-inflate, per-scanline unfilter
  (None/Sub/Up/Average/Paeth), bit depth 8, color types 0/2/3/4/6;
- BMP: BITMAPINFOHEADER, 24-bit uncompressed, bottom-up, 4-byte row pad;
- PPM/PGM (P6/P5 binary): header + raw samples, maxval 255.

Plus a nearest-neighbor resize and a minimal PNG encoder (filter 0) so
the resize operator emits REAL image payloads.  Baseline-sequential
JPEG decodes via the sibling pure-numpy codec (jpegcodec.py);
progressive JPEG, WebP and video formats still require external codecs
and raise NotImplementedError.

Everything here is numpy-vectorized per scanline/image — these kernels
run inside Arrow ``mapInPandas`` batches (operators/multimodal.py), so
one Python call handles a whole batch of payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class ImageDecodeError(ValueError):
    pass


# ---------------------------------------------------------------- PNG --
def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filters.  ``raw`` is h*(1+stride) filter-tagged
    bytes; returns (h, stride) uint8."""
    raw = raw.reshape(h, 1 + stride)
    ftypes, data = raw[:, 0], raw[:, 1:].copy()
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, row = int(ftypes[y]), data[y]
        if ft == 0:
            pass
        elif ft == 1:  # Sub: prefix-sum along x with lag bpp
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            row[:] = row + prior  # uint8 wraps == mod 256
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + (left + int(prior[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth (predictor per RFC 2083 6.6)
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ImageDecodeError(f"unknown PNG filter {ft}")
        prior = row
    return data


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB."""
    if data[:8] != _PNG_SIG:
        raise ImageDecodeError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = None
    while pos + 8 <= len(data):
        (length, ) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ImageDecodeError(f"bit depth {depth} unsupported")
            if inter != 0:
                raise ImageDecodeError("interlaced PNG unsupported")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ImageDecodeError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ImageDecodeError(f"color type {ctype} unsupported")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ImageDecodeError("IDAT size mismatch")
    px = _unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px
    if ctype == 3:
        if plte is None:
            raise ImageDecodeError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # 6: drop alpha


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(scan.tobytes(), 6)) +
            chunk(b"IEND", b""))


# ---------------------------------------------------------------- BMP --
def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BITMAPINFOHEADER BMP -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    (off, ) = struct.unpack("<I", data[10:14])
    (hsz, ) = struct.unpack("<I", data[14:18])
    if hsz < 40:
        raise ImageDecodeError("BITMAPCOREHEADER unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp, ) = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise ImageDecodeError(f"BMP bpp={bpp} comp={comp} unsupported")
    flip = h > 0
    h = abs(h)
    rowsz = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(data, dtype=np.uint8,
                       count=rowsz * h, offset=off)
    px = px.reshape(h, rowsz)[:, :w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    rowsz = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, rowsz), dtype=np.uint8)
    body[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    body = body.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) +
              struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    return header + body


# ------------------------------------------------------------- PPM/PGM --
def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm, maxval<=255 -> RGB."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ImageDecodeError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ImageDecodeError("16-bit netpbm unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch,
                       offset=pos).reshape(h, w, ch)
    return px if ch == 3 else np.repeat(px, 3, axis=2)


# ------------------------------------------------------------ dispatch --
def sniff_mime(data: bytes) -> str:
    if data[:8] == _PNG_SIG:
        return "image/png"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] in (b"P6", b"P5"):
        return "image/x-portable-pixmap"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return "application/octet-stream"


def decode_image(data: bytes) -> np.ndarray:
    """Any supported container -> (h, w, 3) uint8 RGB."""
    mime = sniff_mime(data)
    if mime == "image/png":
        return decode_png(data)
    if mime == "image/bmp":
        return decode_bmp(data)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(data)
    if mime == "image/jpeg":
        from nacc_form_validator_spark.operators.jpegcodec import (
            decode_jpeg)
        return decode_jpeg(data)
    raise NotImplementedError(
        f"{mime}: only PNG/BMP/PPM/baseline-JPEG decode in this "
        f"environment (progressive JPEG, WebP and video need "
        f"PIL/ffmpeg)")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pixel-center
    sampling (the classic NN grid), pure index arithmetic."""
    h, w = arr.shape[:2]
    ys = ((np.arange(height) + 0.5) * h / height).astype(np.int64)
    xs = ((np.arange(width) + 0.5) * w / width).astype(np.int64)
    return arr[np.clip(ys, 0, h - 1)][:, np.clip(xs, 0, w - 1)]


def image_feature(arr: np.ndarray) -> list:
    """8-dim real feature: log-dims + per-channel mean/std (the
    structural stand-in for a CLIP-style embedding — swap the kernel,
    keep the Arrow plumbing)."""
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3).astype(np.float64)
    mean, std = flat.mean(axis=0), flat.std(axis=0)
    feat = [np.log1p(w), np.log1p(h),
            mean[0] / 255.0, mean[1] / 255.0, mean[2] / 255.0,
            std[0] / 255.0, std[1] / 255.0,
            (std[2] / 255.0)]
    return [round(float(x), 6) for x in feat]
