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
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
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
    if mime == "image/gif":
        return decode_gif(data)
    raise NotImplementedError(
        f"{mime}: only PNG/BMP/PPM/GIF/baseline-JPEG decode in this "
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


# -------------------------------------------------------------- GIF --
# GIF87a/89a (the web's third image format): logical screen
# descriptor, global/local color tables, extension-block skipping,
# variable-width LSB-first LZW with table growth to 12 bits and
# mid-stream clears, 4-pass interlace.  First frame only (animation
# frames compose with the frame_sample plan upstream).

def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-flavor LZW: codes are LSB-first, width mcs+1..12, table
    resets on CLEAR; returns exactly ``n_pixels`` index bytes."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    out = bytearray()
    bitpos, total = 0, len(data) * 8

    def init():
        return [bytes([i]) for i in range(clear)] + [None, None]

    table, prev = init(), None
    while len(out) < n_pixels:
        if bitpos + width > total:
            raise ImageDecodeError("truncated LZW stream")
        bi, bo = divmod(bitpos, 8)
        chunk = int.from_bytes(data[bi:bi + 3], "little")
        code = (chunk >> bo) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width, prev = init(), mcs + 1, None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ImageDecodeError("bad first LZW code")
            entry = table[code]
        else:
            if code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):     # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ImageDecodeError("bad LZW code")
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ImageDecodeError("LZW stream ended early")
    return bytes(out[:n_pixels])


def _lzw_encode(mcs: int, seq: bytes) -> bytes:
    """Real LZW compressor emitting a stream the decoder above (and
    any spec decoder) accepts: the encoder SIMULATES the decoder's
    table length to keep code widths in sync, and emits CLEAR when
    the 12-bit table fills."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bits = bytearray()
    acc = nacc = 0
    width = mcs + 1

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    dec_len, first = clear + 2, True     # decoder's table length
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w = b""
    for k in bytes(seq):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if first:                 # decoder's first-after-clear: no append
            first = False
        else:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
        table[wk] = next_code
        next_code += 1
        w = bytes([k])
        if next_code > 4096:      # table full: reset both sides
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            dec_len, first, width = clear + 2, True, mcs + 1
    if w:
        emit(table[w])
        if not first:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
    emit(end)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF -> (h, w, 3) uint8 RGB (first image frame).  Truncated
    files raise ImageDecodeError, never a bare IndexError/ValueError
    (real crawl payloads are frequently cut short)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF")
    try:
        return _decode_gif_body(data)
    except (IndexError, struct.error) as ex:
        raise ImageDecodeError(f"truncated GIF: {ex}") from ex


def _decode_gif_body(data: bytes) -> np.ndarray:
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 7))
        if pos + n > len(data):
            raise ImageDecodeError("truncated global color table")
        gct = np.frombuffer(data[pos:pos + n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                    # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10])
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 7))
                if pos + n > len(data):
                    raise ImageDecodeError("truncated local color table")
                pal = np.frombuffer(data[pos:pos + n],
                                    dtype=np.uint8).reshape(-1, 3)
                pos += n
            if pal is None:
                raise ImageDecodeError("GIF image without color table")
            mcs = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                n = data[pos]
                stream += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(mcs, bytes(stream), iw * ih),
                dtype=np.uint8)
            if int(idx.max(initial=0)) >= len(pal):
                raise ImageDecodeError("palette index out of range")
            img = pal[idx].reshape(ih, iw, 3)
            if ipacked & 0x40:             # 4-pass interlace
                out = np.empty_like(img)
                rows = (list(range(0, ih, 8)) + list(range(4, ih, 8)) +
                        list(range(2, ih, 4)) + list(range(1, ih, 2)))
                out[rows] = img
                img = out
            return img.copy()
        else:
            raise ImageDecodeError(f"unknown GIF block 0x{b:02x}")
    raise ImageDecodeError("GIF has no image frame")


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """(h, w) uint8 index array + (n, 3) palette -> GIF89a bytes with
    a 256-entry global color table and a REAL LZW-compressed stream."""
    indices = np.asarray(indices, dtype=np.uint8)
    h, w = indices.shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)   # GCT 256
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    if interlace:
        rows = (list(range(0, h, 8)) + list(range(4, h, 8)) +
                list(range(2, h, 4)) + list(range(1, h, 2)))
        seq = indices[rows].tobytes()
    else:
        seq = indices.tobytes()
    out += bytes([8])                                    # min code size
    stream = _lzw_encode(8, seq)
    for i in range(0, len(stream), 255):
        part = stream[i:i + 255]
        out += bytes([len(part)]) + part
    out += b"\x00\x3B"
    return bytes(out)
