"""Pure-numpy baseline-sequential JPEG (JFIF) codec.

Closes the round-3 gap: real Common-Crawl imagery is mostly JPEG, and the
container could previously only raise NotImplementedError.  Implemented
from the public JPEG spec (ITU-T T.81): baseline DCT, Huffman entropy
coding, 8-bit precision.

Decoder (``decode_jpeg``) handles what baseline webtext JPEGs contain:

- markers: SOI, APPn/COM (skipped), DQT (8-bit, multiple tables), SOF0,
  DHT (multiple DC/AC tables), DRI + RSTn restart intervals, SOS, EOI;
- canonical Huffman tables reconstructed from the DHT bits/values lists
  (works for Annex-K tables or any custom table);
- interleaved MCU scan with per-component sampling factors (4:4:4,
  4:2:2, 4:2:0), DC prediction, ZRL/EOB run-length AC;
- dequantize -> de-zigzag -> float IDCT (separable orthonormal DCT-III
  as one numpy matmul per block) -> level shift -> clip;
- chroma upsampled by replication; JFIF YCbCr -> RGB.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
ImageDecodeError honestly.

Encoder (``encode_jpeg_gray`` / ``encode_jpeg_rgb``) emits spec-valid
baseline JFIF used by tests and the value oracle: it DECLARES its
Huffman tables in DHT (fixed-length canonical codes — 4-bit DC / 8-bit
AC symbols — rather than memorized Annex-K constants, so the bitstream
is self-describing) and defaults to UNIT quantization tables.  With
q=1, an 8x8 block of constant sample value round-trips LOSSLESSLY:
the DCT of a flat block is DC-only (DC = 8 * (v - 128), an exact
integer), so decode returns the block exactly — the property the
DuckDB value oracle exploits (plans/oracle.py
multimodal_real_decode_jpeg_sql).
"""

from __future__ import annotations

import struct

import numpy as np

from nacc_form_validator_spark.operators.imagecodec import ImageDecodeError

#: zig-zag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
#: (public spec, T.81 figure 5)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_UNIT_Q = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: coeffs = C @ block @ C.T."""
    x = np.arange(8)
    u = x.reshape(8, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    c[0, :] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


# ------------------------------------------------------------------ bits --
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (caller must be byte-aligned)."""
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs 0xFF00, stops at any
    other marker (leaving ``self.marker`` set)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) | 0  # pad past the marker
                self.n += 8
                continue
            if self.pos >= len(d):
                # truncated entropy segment (no terminating marker) —
                # common in real crawl payloads; treat as implicit EOI
                # rather than IndexError
                self.marker = 0xD9
                continue
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(d):
                    self.marker = 0xD9
                    continue
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self) -> None:
        """Discard pad bits and consume the RSTn marker.  The marker may
        not have been seen by ``_fill`` yet (short MCUs leave it beyond
        the buffered lookahead), so also probe the stream directly."""
        self.acc = 0
        self.n = 0
        d = self.data
        if self.marker is None:
            # the byte-aligned pad byte before the RSTn may itself be
            # 0xFF, emitted as stuffed FF 00 — consume any stuffing
            # first or the probe below sees FF 00, never finds the
            # marker, and the pad byte gets decoded as entropy data
            while (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                   and d[self.pos + 1] == 0x00):
                self.pos += 2
            if (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                    and 0xD0 <= d[self.pos + 1] <= 0xD7):
                self.marker = d[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None


# --------------------------------------------------------------- huffman --
class _HuffTable:
    """Canonical Huffman table from DHT bits/values (T.81 C.2)."""

    def __init__(self, bits: list, values: bytes):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bits(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ImageDecodeError("invalid Huffman code in scan")


def _fixed_table(symbols: list) -> tuple:
    """(bits, values, code_map): every symbol gets the same code length
    L = ceil(log2(n + 1)) + (avoid the all-ones code), canonical order.
    Valid DHT content — decoders reconstruct it like any other table."""
    n = len(symbols)
    length = 1
    while (1 << length) - 1 < n + 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    code_map = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, bytes(symbols), code_map


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --------------------------------------------------------------- encoder --
def _encode_block(zz: np.ndarray, pred: int, bw: _BitWriter,
                  dc_map: dict, ac_map: dict) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_map[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_map[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_map[(run << 4) | t]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << t) - 1, t)
        run = 0
    if last < 63:
        code, ln = ac_map[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks_y, n_blocks_x, 64) zigzagged
    quantized int coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,abxy,vy->abuv", _C, blocks, _C)
    zz = coef.reshape(by, bx, 64)[:, :, _ZZ]
    return np.rint(zz / q).astype(np.int64)


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]


def _dht_segment(tclass: int, tid: int, bits: list, values: bytes) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + values
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _encode_planes(planes: list, qtables: list, w: int, h: int,
                   sampling: list = None,
                   restart_interval: int = 0) -> bytes:
    """Shared encoder body.  ``planes[i]`` is an (h*vs/vmax, w*hs/hmax)
    float64 plane (already color-transformed and subsampled);
    ``sampling[i] = (hs, vs)`` per component (default 1x1 = 4:4:4).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (DC predictors reset, byte-aligned) — the mechanism real
    encoders use so a corrupt web image loses one interval, not the
    whole scan."""
    ncomp = len(planes)
    sampling = sampling or [(1, 1)] * ncomp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, q in enumerate(qtables):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1],
                      0 if c == 0 else min(1, len(qtables) - 1)])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    dc_bits, dc_vals, dc_map = _fixed_table(_DC_SYMBOLS)
    ac_bits, ac_vals, ac_map = _fixed_table(_AC_SYMBOLS)
    out += _dht_segment(0, 0, dc_bits, dc_vals)
    out += _dht_segment(1, 0, ac_bits, ac_vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0 / AC table 0 for all
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    qzz = [np.asarray(q, dtype=np.float64) for q in qtables]
    blocks = [_fdct_quant(p, qzz[0 if i == 0 else min(1, len(qzz) - 1)])
              for i, p in enumerate(planes)]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcux = w // (8 * hmax)
    mcuy = h // (8 * vmax)
    n_mcu = 0
    n_rst = 0
    for yb in range(mcuy):
        for xb in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.align()
                bw.raw(bytes([0xFF, 0xD0 + (n_rst % 8)]))
                n_rst += 1
                preds = [0] * ncomp
            for c in range(ncomp):
                hs, vs = sampling[c]
                for v in range(vs):
                    for u in range(hs):
                        preds[c] = _encode_block(
                            blocks[c][yb * vs + v, xb * hs + u],
                            preds[c], bw, dc_map, ac_map)
            n_mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"            # EOI
    return bytes(out)


def encode_jpeg_gray(arr: np.ndarray, quant: np.ndarray = None,
                     restart_interval: int = 0) -> bytes:
    """(h, w) uint8 grayscale -> baseline JFIF bytes (dims must be
    multiples of 8; unit quantization by default)."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiple-of-8 dims")
    q = _UNIT_Q if quant is None else np.asarray(quant).reshape(64)
    return _encode_planes([arr], [q], w, h,
                          restart_interval=restart_interval)


def encode_jpeg_rgb(arr: np.ndarray, quant: np.ndarray = None,
                    subsample: bool = False,
                    restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.  ``subsample=True``
    emits 4:2:0 (box-averaged chroma, dims must be multiples of 16) —
    the layout virtually all web JPEGs use; default is 4:4:4."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w, _ = arr.shape
    mult = 16 if subsample else 8
    if h % mult or w % mult:
        raise ValueError(f"encoder requires multiple-of-{mult} dims")
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    q = _UNIT_Q if quant is None else np.asarray(quant).reshape(64)
    if subsample:
        def down(p):
            return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        return _encode_planes([y, down(cb), down(cr)], [q, q], w, h,
                              sampling=[(2, 2), (1, 1), (1, 1)],
                              restart_interval=restart_interval)
    return _encode_planes([y, cb, cr], [q, q], w, h,
                          restart_interval=restart_interval)


# --------------------------------------------------------------- decoder --
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff = {}
    comps = None
    w = h = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ImageDecodeError("marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:       # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue             # standalone
        (seglen, ) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xC4:       # DHT (may hold several tables)
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                values = body[p + 17:p + 17 + n]
                huff[(tc_th >> 4, tc_th & 0x0F)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker == 0xDB:     # DQT
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq >> 4:
                    raise ImageDecodeError("16-bit DQT unsupported")
                qt[pq_tq & 0x0F] = np.frombuffer(
                    body[p + 1:p + 65], dtype=np.uint8).astype(np.float64)
                p += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ImageDecodeError(f"{prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "hs": samp >> 4,
                              "vs": samp & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                "only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:     # DRI
            (restart_interval, ) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:     # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tables = body[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan.append((comp, tables >> 4, tables & 0x0F))
            rgb = _decode_scan(data, pos + seglen, scan, qt, huff,
                               w, h, restart_interval)
            return rgb
        pos += seglen
    raise ImageDecodeError("no SOS marker found")


def _decode_scan(data, pos, scan, qt, huff, w, h, restart_interval):
    hmax = max(c["hs"] for c, _, _ in scan)
    vmax = max(c["vs"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for comp, _, _ in scan:
        pw, ph = mcux * 8 * comp["hs"], mcuy * 8 * comp["vs"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(scan)
            for ci, (comp, tdc, tac) in enumerate(scan):
                dq = qt[comp["tq"]]
                for v in range(comp["vs"]):
                    for u in range(comp["hs"]):
                        zz = _decode_block(br, huff[(0, tdc)],
                                           huff[(1, tac)])
                        preds[ci] += int(zz[0])  # DC prediction pre-dequant
                        zz[0] = preds[ci]
                        blk = np.zeros(64)
                        blk[_ZZ] = zz.astype(np.float64) * dq
                        f = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                        yy = (my * comp["vs"] + v) * 8
                        xx = (mx * comp["hs"] + u) * 8
                        planes[ci][yy:yy + 8, xx:xx + 8] = f
            n_mcu += 1
    out = []
    for (comp, _, _), plane in zip(scan, planes):
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, dc_tbl: _HuffTable,
                  ac_tbl: _HuffTable) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = dc_tbl.decode(br)
    zz[0] = _extend(br.bits(t), t)
    k = 1
    while k < 64:
        rs = ac_tbl.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:      # ZRL
                k += 16
                continue
            break            # EOB
        k += r
        if k > 63:
            raise ImageDecodeError("AC run past block end")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1
