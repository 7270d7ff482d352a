"""Baseline JPEG codec in pure numpy/stdlib — no PIL in this container,
and the reference's Image htype defaults to png/**jpeg**
(`python/deeplake/types.pyi:1011-1036`), so the jpeg decode path gets a
real in-container implementation alongside the stdlib PNG/PPM/BMP
codecs in multimodal.py.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale and YCbCr
with sampling factors up to 2x2 — 4:4:4, 4:2:2 and the real-world
default 4:2:0 all decode; the paired encoder emits 4:4:4 or 4:2:0.
Progressive (SOF2), restart-marker, and 16-bit streams raise
`JpegUnsupported` and the caller falls back to the optional-import
(PIL) branch or the deterministic fake. Huffman and quantization
tables are read FROM the stream (DHT/DQT), per the standard — nothing
here depends on the Annex-K defaults, and the encoder writes its own
canonical tables, so the pair is self-consistent AND standard-valid.

The DCT is the exact orthonormal DCT-II as two 8x8 matrix products
(numpy), the IDCT its transpose — no scipy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_baseline", "decode_baseline", "JpegUnsupported"]


class JpegUnsupported(Exception):
    """Stream uses features outside the baseline <=2x2-sampling subset."""


# --------------------------------------------------------------------------
# shared tables

#: zigzag scan order: zigzag position -> (row, col) raster index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: mid-quality luminance quant table (standard Annex-K table scaled ~q75)
_QTAB = np.array([
    8, 6, 5, 8, 12, 20, 26, 31,
    6, 6, 7, 10, 13, 29, 30, 28,
    7, 7, 8, 12, 20, 29, 35, 28,
    7, 9, 11, 15, 26, 44, 40, 31,
    9, 11, 19, 28, 34, 55, 52, 39,
    12, 18, 28, 32, 41, 52, 57, 46,
    25, 32, 39, 44, 52, 61, 60, 51,
    36, 46, 48, 49, 56, 50, 52, 50,
], dtype=np.int64).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0 / np.sqrt(2)
    return c * 0.5  # orthonormal


_C = _dct_matrix()


def _category(v: int) -> int:
    """JPEG magnitude category (bit size) of a signed value."""
    return int(abs(int(v))).bit_length()


# --------------------------------------------------------------------------
# bit I/O

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1s per the standard


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        while self._n <= 24:
            if self.pos >= len(self.data):
                self._acc = (self._acc << 8) | 0
                self._n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (EOI etc.) — treat as end of entropy data
                    self.pos -= 1
                    self._acc = (self._acc << 8) | 0
                    self._n += 8
                    continue
            self._acc = (self._acc << 8) | b
            self._n += 8

    def get(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill()
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        return v

    def receive_extend(self, size: int) -> int:
        """Read `size` magnitude bits and sign-extend per F.2.2.1."""
        if size == 0:
            return 0
        v = self.get(size)
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v


# --------------------------------------------------------------------------
# canonical Huffman construction (encoder) and decoding (both)

def _canonical_code(symbols: list[int]) -> tuple[list[int], dict[int, tuple[int, int]]]:
    """A valid canonical Huffman table over `symbols`: balanced lengths
    (ceil(log2 n), some at that length, spillover one longer), encoded
    exactly like a DHT segment expects. Returns (bits_counts[1..16],
    {symbol: (code, length)})."""
    n = len(symbols)
    if n == 1:
        # a 1-bit code for the single symbol (all-ones code avoided by
        # giving it code 0)
        return [1] + [0] * 15, {symbols[0]: (0, 1)}
    base = max(1, (n - 1).bit_length())
    # all codes same length `base` works iff 2^base > n (need one spare
    # slot so the all-ones prefix is never a valid code per the spec's
    # convention; decoders accept it anyway, keep the spare for safety)
    length = base if (1 << base) > n else base + 1
    counts = [0] * 16
    counts[length - 1] = n
    table = {}
    code = 0
    for s in symbols:
        table[s] = (code, length)
        code += 1
    return counts, table


def _dht_segment(table_class: int, table_id: int,
                 counts: list[int], table: dict[int, tuple[int, int]]) -> bytes:
    # symbols in canonical (code) order
    syms = sorted(table, key=lambda s: table[s][0])
    payload = bytes([(table_class << 4) | table_id]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


class _HuffDecoder:
    """DHT-driven decoder: (length, code) -> symbol via per-length
    first-code offsets (the standard's canonical decode)."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.min_code = {}
        self.max_code = {}
        self.val_ptr = {}
        self.symbols = symbols
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.get(1)
            if length in self.max_code and code <= self.max_code[length]:
                return self.symbols[self.val_ptr[length] + code - self.min_code[length]]
        raise JpegUnsupported("invalid huffman code")


# --------------------------------------------------------------------------
# encoder

def _to_planes(img: np.ndarray, subsampling: str):
    """img -> (level-shifted component planes, sampling factors (h, v))."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        return [img.astype(np.float64) - 128.0], [(1, 1)]
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsampling == "444":
        return [y - 128.0, cb - 128.0, cr - 128.0], [(1, 1)] * 3
    if subsampling not in ("420", "422"):
        raise ValueError("subsampling must be '444', '422' or '420'")

    def down(c: np.ndarray, fy: int, fx: int) -> np.ndarray:
        h, w = c.shape
        ph, pw = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
        pad = np.empty((ph, pw))
        pad[:h, :w] = c
        if ph > h:
            pad[h:, :w] = c[h - 1:h, :]
        if pw > w:
            pad[:, w:] = pad[:, w - 1:w]
        return pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))

    fy, fx = (2, 2) if subsampling == "420" else (1, 2)
    lum = (2, 2) if subsampling == "420" else (2, 1)
    return ([y - 128.0, down(cb, fy, fx) - 128.0, down(cr, fy, fx) - 128.0],
            [lum, (1, 1), (1, 1)])


def _plane_blocks(chan: np.ndarray, bh: int, bw: int) -> list:
    """Quantized zigzag blocks of `chan` padded (edge-replicate) to a
    (bh x bw)-block grid; indexed [by][bx]."""
    ph, pw = bh * 8, bw * 8
    padded = np.zeros((ph, pw))
    h, w = chan.shape
    padded[:h, :w] = chan
    if ph > h:
        padded[h:, :w] = chan[h - 1:h, :]
    if pw > w:
        padded[:, w:] = padded[:, w - 1:w]
    rows = []
    for by in range(bh):
        row = []
        for bx in range(bw):
            blk = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = _C @ blk @ _C.T
            q = np.round(coef / _QTAB).astype(np.int64)
            row.append(q.reshape(64)[_ZIGZAG])
        rows.append(row)
    return rows


def encode_baseline(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a baseline
    sequential JPEG. `subsampling`: '444' (default) or '420' (2x2
    chroma subsampling — the real-world default layout)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    planes, sampling = _to_planes(img, subsampling)
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = [
        _plane_blocks(planes[ci], mcus_y * vs, mcus_x * hs)
        for ci, (hs, vs) in enumerate(sampling)
    ]

    def mcu_stream():
        """yields (component index, zigzag block) in scan order."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(sampling):
                    for v in range(vs):
                        for u in range(hs):
                            yield ci, comp_blocks[ci][my * vs + v][mx * hs + u]

    # pass 1: symbol alphabets for the shared canonical DC/AC tables
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00, 0xF0}
    preds = [0] * len(planes)
    for ci, zz in mcu_stream():
        dc_syms.add(_category(int(zz[0]) - preds[ci]))
        preds[ci] = int(zz[0])
        run = 0
        for vv in zz[1:]:
            if vv == 0:
                run += 1
                continue
            while run > 15:
                run -= 16
            ac_syms.add((run << 4) | _category(int(vv)))
            run = 0
    dc_counts, dc_table = _canonical_code(sorted(dc_syms))
    ac_counts, ac_table = _canonical_code(sorted(ac_syms))

    # pass 2: entropy-coded data
    bw_ = _BitWriter()
    preds = [0] * len(planes)
    for ci, zz in mcu_stream():
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        size = _category(diff)
        code, ln = dc_table[size]
        bw_.put(code, ln)
        if size:
            bw_.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
        for i in range(1, last_nz + 1):
            vv = int(zz[i])
            if vv == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_table[0xF0]
                bw_.put(code, ln)
                run -= 16
            size = _category(vv)
            code, ln = ac_table[(run << 4) | size]
            bw_.put(code, ln)
            bw_.put(vv if vv >= 0 else vv + (1 << size) - 1, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_table[0x00]
            bw_.put(code, ln)
    bw_.flush()

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    qz = _QTAB.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in qz)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (hs, vs) in enumerate(sampling):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_table)
    out += _dht_segment(1, 0, ac_counts, ac_table)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder

def decode_baseline(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, 1 or 3
    components, sampling factors up to 2x2 — covers 4:4:4, 4:2:2 and
    the real-world-default 4:2:0) to (h, w) or (h, w, 3) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise JpegUnsupported("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    comps: list[dict] = []
    scan_data = None
    scan_comp_tables: list[tuple[int, int]] = []
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise JpegUnsupported("16-bit quant table")
                raster = np.zeros(64, dtype=np.int64)
                raster[_ZIGZAG] = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                qtabs[tq] = raster.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _HuffDecoder(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegUnsupported("non-8-bit precision")
            comps = []
            p = 6
            for _ in range(nc):
                cid, sampling, tq = seg[p], seg[p + 1], seg[p + 2]
                hs, vs = sampling >> 4, sampling & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise JpegUnsupported(f"sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "tq": tq, "h": hs, "v": vs})
                p += 3
            frame = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"non-baseline frame marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            scan_comp_tables = []
            for _ in range(ns):
                td, ta = seg[p + 1] >> 4, seg[p + 1] & 0x0F
                scan_comp_tables.append((td, ta))
                p += 2
            scan_data = payload[pos + seglen:]
            break
        pos += seglen
    if frame is None or scan_data is None:
        raise JpegUnsupported("missing SOF0/SOS")
    if restart_interval:
        raise JpegUnsupported("restart markers")
    h, w, nc = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(scan_data)
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c in comps]
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                td, ta = scan_comp_tables[ci]
                dc = huff[(0, td)]
                ac = huff[(1, ta)]
                q = qtabs[c["tq"]]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc.decode(br)
                        preds[ci] += br.receive_extend(size)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = ac.decode(br)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegUnsupported("AC index overflow")
                            zz[k] = br.receive_extend(size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz
                        blk = _C.T @ (coef.reshape(8, 8) * q) @ _C
                        by = (my * c["v"] + v) * 8
                        bx = (mx * c["h"] + u) * 8
                        planes[ci][by:by + 8, bx:bx + 8] = blk
    # upsample each component to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p_ = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p_ = np.repeat(p_, ry, axis=0)
        if rx > 1:
            p_ = np.repeat(p_, rx, axis=1)
        full.append(p_[:h, :w] + 128.0)
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise JpegUnsupported(f"{nc}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
