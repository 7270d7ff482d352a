"""Baseline JPEG codec in pure numpy/stdlib — no PIL in this container,
and the reference's Image htype defaults to png/**jpeg**
(`python/deeplake/types.pyi:1011-1036`), so the jpeg decode path gets a
real in-container implementation alongside the stdlib PNG/PPM/BMP
codecs in multimodal.py.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale (1 component)
and YCbCr 4:4:4 (3 components, no subsampling) — exactly what the
paired encoder emits; progressive/subsampled streams raise
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
    """Stream uses features outside the baseline 4:4:4 subset."""


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

def encode_baseline(img: np.ndarray) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a baseline
    sequential JPEG (4:4:4, one shared quant/huffman table set)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        comps = [img.astype(np.float64) - 128.0]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    h, w = img.shape[:2]

    # quantized zigzag blocks per component
    def blocks_of(chan: np.ndarray):
        ph = (h + 7) // 8 * 8
        pw = (w + 7) // 8 * 8
        padded = np.zeros((ph, pw))
        padded[:h, :w] = chan
        padded[h:, :w] = chan[h - 1:h, :]     # edge-replicate padding
        padded[:, w:] = padded[:, w - 1:w]
        out = []
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                blk = padded[by:by + 8, bx:bx + 8]
                coef = _C @ blk @ _C.T
                q = np.round(coef / _QTAB).astype(np.int64)
                out.append(q.reshape(64)[_ZIGZAG])
        return out

    comp_blocks = [blocks_of(c) for c in comps]

    # gather symbol alphabets for the (single, shared) DC and AC tables
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00, 0xF0}
    gather_preds = [0] * len(comp_blocks)
    for bi in range(len(comp_blocks[0])):
        for ci, blocks in enumerate(comp_blocks):
            zz = blocks[bi]
            dc_syms.add(_category(int(zz[0]) - gather_preds[ci]))
            gather_preds[ci] = int(zz[0])
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    run -= 16
                ac_syms.add((run << 4) | _category(int(v)))
                run = 0
    dc_counts, dc_table = _canonical_code(sorted(dc_syms))
    ac_counts, ac_table = _canonical_code(sorted(ac_syms))

    bw = _BitWriter()
    # a multi-component baseline scan is INTERLEAVED: one MCU = one
    # 8x8 block of EACH component at the same position (4:4:4, 1x1
    # sampling), with per-component DC predictors
    preds = [0] * len(comp_blocks)
    for bi in range(len(comp_blocks[0])):
        for ci, blocks in enumerate(comp_blocks):
            zz = blocks[bi]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            size = _category(diff)
            code, ln = dc_table[size]
            bw.put(code, ln)
            if size:
                bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_table[0xF0]
                    bw.put(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_table[(run << 4) | size]
                bw.put(code, ln)
                bw.put(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_table[0x00]
                bw.put(code, ln)
    bw.flush()

    ncomp = len(comps)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit, zigzag order)
    qz = _QTAB.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in qz)
    # SOF0
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, qtable 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_table)
    out += _dht_segment(1, 0, ac_counts, ac_table)
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder

def decode_baseline(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, 1 or 3
    components, 1x1 sampling) to (h, w) or (h, w, 3) uint8."""
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
        if marker == 0xDB:  # DQT (possibly several tables per segment)
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
                if sampling != 0x11:
                    raise JpegUnsupported("subsampled JPEG (not 4:4:4)")
                comps.append({"id": cid, "tq": tq})
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
    br = _BitReader(scan_data)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bwid * 8)) for _ in range(nc)]
    preds = [0] * nc
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(nc):
                td, ta = scan_comp_tables[ci]
                dc = huff[(0, td)]
                ac = huff[(1, ta)]
                q = qtabs[comps[ci]["tq"]]
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
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
    planes = [p[:h, :w] + 128.0 for p in planes]
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise JpegUnsupported(f"{nc}-component JPEG")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
