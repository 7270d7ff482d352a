"""Baseline JPEG codec in pure numpy/stdlib — no PIL in this container,
and the reference's Image htype defaults to png/**jpeg**
(`python/deeplake/types.pyi:1011-1036`), so the jpeg decode path gets a
real in-container implementation alongside the stdlib PNG/PPM/BMP
codecs in multimodal.py.

Scope: baseline sequential DCT (SOF0) AND progressive (SOF2 —
spectral selection + successive approximation, the dominant layout in
web-crawled corpora), 8-bit, grayscale and YCbCr with sampling factors
up to 2x2 — 4:4:4, 4:2:2 and the real-world default 4:2:0 all decode.
LOSSLESS (SOF3, T.81 Annex H — the archival/medical-imaging flavor)
also decodes and encodes: Huffman-coded prediction residuals at any
precision 2-16 bits, predictors 1-7, pixel-exact at uint8 AND uint16.
EXTENDED sequential (SOF1) decodes and encodes at 8 AND 12-bit
precision (uint16 samples, 16-bit DQT entries — the DICOM DCT
flavor). The paired lossy encoders emit baseline (4:4:4/4:2:2/4:2:0)
and progressive (libjpeg-style scan script) streams from the SAME
quantization, so round-trip tests can demand pixel-identical
agreement. Restart markers (DRI/RSTn) decode — DC predictors, EOB
runs, and bit alignment reset per interval (E.2.4) — and the baseline
encoder can emit them. ARITHMETIC-coded frames (SOF9 sequential and
SOF10 progressive — the QM coder, T.81 Annex D + the Annex F/G
statistical models) decode AND encode, byte-for-byte interoperable
with libjpeg in both directions (tests compile a small harness against
the system libjpeg to prove it). Hierarchical streams raise
`JpegUnsupported` and the caller falls
back to the optional-import (PIL) branch or the deterministic fake.
Huffman
and quantization tables are read FROM the stream (DHT/DQT), per the
standard — nothing here depends on the Annex-K defaults, and the
encoders write their own canonical tables, so the pair is
self-consistent AND standard-valid.

The DCT is the exact orthonormal DCT-II as two 8x8 matrix products
(numpy), the IDCT its transpose — no scipy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_baseline", "encode_progressive", "encode_lossless",
           "encode_arithmetic", "encode_arithmetic_progressive",
           "decode", "decode_baseline", "JpegUnsupported"]


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

    def restart(self) -> None:
        """Cross an RSTn marker: drop buffered (padding) bits, consume
        the two marker bytes, resume on the byte boundary (E.2.4)."""
        self._acc = 0
        self._n = 0
        while self.pos < len(self.data) and self.data[self.pos] != 0xFF:
            self.pos += 1
        if (self.pos + 1 < len(self.data)
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2


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

def _to_planes(img: np.ndarray, subsampling: str, precision: int = 8):
    """img -> (level-shifted component planes, sampling factors (h, v)).
    The level shift / chroma center scale with `precision` (T.81
    A.3.1: 2^(P-1))."""
    center = float(1 << (precision - 1))
    img = np.asarray(img, dtype=np.uint8 if precision == 8 else np.uint16)
    if img.ndim == 2:
        return [img.astype(np.float64) - center], [(1, 1)]
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w) or (h, w, 3)")
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
    if subsampling == "444":
        return [y - center, cb - center, cr - center], [(1, 1)] * 3
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
    return ([y - center, down(cb, fy, fx) - center,
             down(cr, fy, fx) - center],
            [lum, (1, 1), (1, 1)])


def _plane_blocks(chan: np.ndarray, bh: int, bw: int,
                  qtab: np.ndarray | None = None) -> list:
    """Quantized zigzag blocks of `chan` padded (edge-replicate) to a
    (bh x bw)-block grid; indexed [by][bx]."""
    if qtab is None:
        qtab = _QTAB
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
            q = np.round(coef / qtab).astype(np.int64)
            row.append(q.reshape(64)[_ZIGZAG])
        rows.append(row)
    return rows


def encode_baseline(img: np.ndarray, subsampling: str = "444",
                    restart_interval: int = 0, precision: int = 8) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a baseline
    sequential JPEG. `subsampling`: '444' (default) or '420' (2x2
    chroma subsampling — the real-world default layout).
    `restart_interval` > 0 writes a DRI segment and an RSTn marker
    every that-many MCUs (DC predictors reset per interval — the
    error-resilience layout camera firmware emits). `precision=12`
    emits an EXTENDED sequential frame (SOF1, uint16 samples
    0..4095, 16-bit DQT) — the DICOM/archival DCT flavor."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    img = np.asarray(img, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(img.max(initial=0)) > 4095:
        raise ValueError("12-bit samples exceed 4095")
    qtab = _QTAB if precision == 8 else _QTAB * 16
    h, w = img.shape[:2]
    planes, sampling = _to_planes(img, subsampling, precision)
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = [
        _plane_blocks(planes[ci], mcus_y * vs, mcus_x * hs, qtab)
        for ci, (hs, vs) in enumerate(sampling)
    ]
    ri = int(restart_interval)

    def mcu_stream():
        """yields (mcu index, component index, zigzag block)."""
        for m, (my, mx) in enumerate(
                (my, mx) for my in range(mcus_y) for mx in range(mcus_x)):
            for ci, (hs, vs) in enumerate(sampling):
                for v in range(vs):
                    for u in range(hs):
                        yield m, ci, comp_blocks[ci][my * vs + v][mx * hs + u]

    # pass 1: symbol alphabets for the shared canonical DC/AC tables
    # (restart intervals reset the DC predictor, changing the diffs —
    # the alphabet pass must mirror that)
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00, 0xF0}
    preds = [0] * len(planes)
    last_m = -1
    for m, ci, zz in mcu_stream():
        if ri and m != last_m and m % ri == 0 and m:
            preds = [0] * len(planes)
        last_m = m
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
    last_m = -1
    rst = 0
    for m, ci, zz in mcu_stream():
        if ri and m != last_m and m % ri == 0 and m:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
        last_m = m
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
    qz = qtab.reshape(64)[_ZIGZAG]
    if precision == 8:
        out += (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
                + bytes(int(x) for x in qz))
    else:  # 16-bit DQT entries (pq=1) for the extended frame
        out += (b"\xff\xdb" + struct.pack(">H", 131) + b"\x10"
                + b"".join(struct.pack(">H", int(x)) for x in qz))
    sof = bytearray(struct.pack(">BHHB", precision, h, w, ncomp))
    for ci, (hs, vs) in enumerate(sampling):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_counts, dc_table)
    out += _dht_segment(1, 0, ac_counts, ac_table)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)  # DRI
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (SOF2) — spectral selection + successive
# approximation, the libjpeg-style scan script, so web-crawl-shaped
# streams exercise every decoder path in round-trip tests.

class _ProgScanState:
    """Per-scan EOB-run accumulation (+ the refinement correction bits
    that ride along with a deferred EOB symbol, T.81 G.1.2.3)."""

    def __init__(self):
        self.eobrun = 0
        self.pending: list[int] = []


def _flush_eobrun(st: _ProgScanState, sym, bits) -> None:
    if st.eobrun > 0:
        nb = st.eobrun.bit_length() - 1
        sym(nb << 4)
        if nb:
            bits(st.eobrun - (1 << nb), nb)
        st.eobrun = 0
    for b in st.pending:
        bits(b, 1)
    st.pending = []


def _enc_dc_first(coef, preds, ci, al, sym, bits) -> None:
    v = int(coef[0]) >> al          # DC point transform = arithmetic shift
    diff = v - preds[ci]
    preds[ci] = v
    size = _category(diff)
    sym(size)
    if size:
        bits(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _enc_ac_first(coef, ss, se, al, st, sym, bits) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        a = abs(v) >> al            # AC point transform = toward zero
        if a == 0:
            run += 1
            continue
        _flush_eobrun(st, sym, bits)
        while run > 15:
            sym(0xF0)
            run -= 16
        size = a.bit_length()
        sym((run << 4) | size)
        sv = a if v > 0 else -a
        bits(sv if sv >= 0 else sv + (1 << size) - 1, size)
        run = 0
    if run > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(st, sym, bits)


def _enc_ac_refine(coef, ss, se, al, st, sym, bits) -> None:
    absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k                 # last NEWLY-nonzero coefficient
    run = 0
    br_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            _flush_eobrun(st, sym, bits)
            sym(0xF0)
            run -= 16
            for b in br_bits:
                bits(b, 1)
            br_bits = []
        if t > 1:                   # history coefficient: correction bit
            br_bits.append(t & 1)
            continue
        _flush_eobrun(st, sym, bits)
        sym((run << 4) | 1)
        bits(1 if coef[k] > 0 else 0, 1)
        for b in br_bits:
            bits(b, 1)
        br_bits = []
        run = 0
    if run > 0 or br_bits:
        st.eobrun += 1
        st.pending.extend(br_bits)
        if st.eobrun == 0x7FFF:
            _flush_eobrun(st, sym, bits)


def encode_progressive(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode as a PROGRESSIVE JPEG (SOF2) with a libjpeg-flavored scan
    script: shifted DC first scan + DC refinement, per-component AC
    band scans (the luma band split 1-5 / 6-63) at Al=1 followed by a
    full-band refinement to Al=0 — so decoding exercises spectral
    selection, successive approximation, and EOB-run accumulation.
    Same quantization as the baseline encoder: a progressive re-encode
    of the same image decodes to the IDENTICAL pixels (tested)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    planes, sampling = _to_planes(img, subsampling)
    ncomp = len(planes)
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = [
        _plane_blocks(planes[ci], mcus_y * vs, mcus_x * hs)
        for ci, (hs, vs) in enumerate(sampling)
    ]

    def dc_blocks():
        """interleaved MCU order over every component's blocks."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(sampling):
                    for v in range(vs):
                        for u in range(hs):
                            yield ci, comp_blocks[ci][my * vs + v][mx * hs + u]

    def ac_blocks(ci):
        """non-interleaved raster order over the REAL block grid."""
        hs, vs = sampling[ci]
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield comp_blocks[ci][by][bx]

    # scan script
    scans: list[dict] = []
    scans.append({"kind": "dc_first", "al": 1})
    for ci in range(ncomp):
        if ci == 0:
            scans.append({"kind": "ac_first", "ci": 0, "ss": 1, "se": 5,
                          "al": 1})
            scans.append({"kind": "ac_first", "ci": 0, "ss": 6, "se": 63,
                          "al": 1})
        else:
            scans.append({"kind": "ac_first", "ci": ci, "ss": 1, "se": 63,
                          "al": 1})
        scans.append({"kind": "ac_refine", "ci": ci, "ss": 1, "se": 63,
                      "ah": 1, "al": 0})
    scans.append({"kind": "dc_refine", "ah": 1, "al": 0})

    def run_scan(sc, sym, bits):
        if sc["kind"] == "dc_first":
            preds = [0] * ncomp
            for ci, zz in dc_blocks():
                _enc_dc_first(zz, preds, ci, sc["al"], sym, bits)
        elif sc["kind"] == "dc_refine":
            for ci, zz in dc_blocks():
                bits((int(zz[0]) >> sc["al"]) & 1, 1)
        else:
            st = _ProgScanState()
            fn = _enc_ac_first if sc["kind"] == "ac_first" else _enc_ac_refine
            for zz in ac_blocks(sc["ci"]):
                fn(zz, sc["ss"], sc["se"], sc["al"], st, sym, bits)
            _flush_eobrun(st, sym, bits)

    out = bytearray(b"\xff\xd8")  # SOI
    qz = _QTAB.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in qz)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (hs, vs) in enumerate(sampling):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof

    for sc in scans:
        # pass 1: this scan's symbol alphabet -> its own canonical DHT
        syms: set[int] = set()
        run_scan(sc, syms.add, lambda v, n: None)
        table: dict[int, tuple[int, int]] = {}
        if sc["kind"] != "dc_refine":           # DC refinement is raw bits
            counts, table = _canonical_code(sorted(syms) or [0])
            tc = 0 if sc["kind"] == "dc_first" else 1
            out += _dht_segment(tc, 0, counts, table)
        # SOS header
        if sc["kind"] in ("dc_first", "dc_refine"):
            sos = bytearray([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, 0x00])
            ss_, se_ = 0, 0
        else:
            sos = bytearray([1, sc["ci"] + 1, 0x00])
            ss_, se_ = sc["ss"], sc["se"]
        sos += bytes([ss_, se_, (sc.get("ah", 0) << 4) | sc["al"]])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        # pass 2: entropy-coded data
        bw_ = _BitWriter()
        run_scan(sc,
                 lambda s, t=table, b=bw_: b.put(*t[s]),
                 lambda v, n, b=bw_: b.put(v, n))
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder — baseline (SOF0) and progressive (SOF2: spectral selection +
# successive approximation, per ITU T.81 G.2 / the libjpeg phuff decoder)

def _entropy_end(payload: bytes, start: int) -> int:
    """End of an entropy-coded segment: the first 0xFF not followed by a
    stuffed 0x00 or a restart marker."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _parse_stream(payload: bytes):
    """Marker walk -> (frame, comps, qtabs, scans). Each scan carries a
    SNAPSHOT of the Huffman tables in force at its SOS (progressive
    streams redefine DHT between scans)."""
    if payload[:2] != b"\xff\xd8":
        raise JpegUnsupported("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    comps: list[dict] = []
    scans: list[dict] = []
    restart_interval = 0
    arith = False
    cond_dc: dict[int, tuple[int, int]] = {}
    cond_ac: dict[int, int] = {}
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
        if marker == 0xDB:  # DQT (pq=0: 8-bit entries; pq=1: 16-bit)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                raster = np.zeros(64, dtype=np.int64)
                if pq == 0:
                    raster[_ZIGZAG] = np.frombuffer(seg[p:p + 64],
                                                    dtype=np.uint8)
                    p += 64
                elif pq == 1:
                    raster[_ZIGZAG] = np.frombuffer(
                        seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    raise JpegUnsupported(f"DQT precision {pq}")
                qtabs[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _HuffDecoder(counts, symbols)
                p += 17 + n
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            p = 0
            while p < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0x0F
                v = seg[p + 1]
                p += 2
                if tc == 0:
                    cond_dc[tb] = (v & 0x0F, v >> 4)    # (L, U)
                else:
                    cond_ac[tb] = v                     # Kx
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended sequential (8/12-bit) /
            # SOF2 progressive / SOF3 lossless / SOF9+SOF10 the
            # arithmetic-coded twins of SOF1/SOF2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if marker in (0xC0, 0xC2, 0xCA) and prec != 8:
                raise JpegUnsupported("non-8-bit precision")
            if marker == 0xC1 and prec not in (8, 12):
                raise JpegUnsupported(f"extended precision {prec}")
            if marker == 0xC9 and prec not in (8, 12):
                raise JpegUnsupported(f"arith precision {prec}")
            arith = marker in (0xC9, 0xCA)
            if marker == 0xC3 and not (2 <= prec <= 16):
                raise JpegUnsupported(f"lossless precision {prec}")
            comps = []
            p = 6
            for _ in range(nc):
                cid, sampling, tq = seg[p], seg[p + 1], seg[p + 2]
                hs, vs = sampling >> 4, sampling & 0x0F
                if marker == 0xC3 and (hs, vs) != (1, 1):
                    raise JpegUnsupported("subsampled lossless frame")
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise JpegUnsupported(f"sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "tq": tq, "h": hs, "v": vs})
                p += 3
            mode = {0xC0: False, 0xC1: False, 0xC2: True,
                    0xC3: "lossless", 0xC9: False, 0xCA: True}[marker]
            frame = (h, w, nc, mode, prec)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"unsupported frame marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            specs = []
            for _ in range(ns):
                cs = seg[p]
                td, ta = seg[p + 1] >> 4, seg[p + 1] & 0x0F
                ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
                specs.append((ci, td, ta))
                p += 2
            ss, se, ahal = seg[p], seg[p + 1], seg[p + 2]
            data_start = pos + seglen
            data_end = _entropy_end(payload, data_start)
            scans.append({
                "specs": specs, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 0x0F,
                "data": payload[data_start:data_end],
                "huff": dict(huff),
                "ri": restart_interval,
                "arith": arith,
                "cond_dc": dict(cond_dc),
                "cond_ac": dict(cond_ac),
            })
            pos = data_end
            continue
        pos += seglen
    if frame is None or not scans:
        raise JpegUnsupported("missing SOF/SOS")
    return frame, comps, qtabs, scans


def _comp_block_dims(c: dict, w: int, h: int, hmax: int, vmax: int):
    """REAL (non-MCU-padded) block grid of one component — the block
    count a non-interleaved scan codes (T.81 A.2.2)."""
    cw = -(-(w * c["h"]) // hmax)
    ch = -(-(h * c["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _block_full(br, dc, ac, coef, preds, ci):
    """Baseline DC+AC decode of one block (SOF0 single-scan)."""
    size = dc.decode(br)
    preds[ci] += br.receive_extend(size)
    coef[0] = preds[ci]
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
        coef[k] = br.receive_extend(size)
        k += 1


def _block_dc_first(br, dc, coef, preds, ci, al):
    size = dc.decode(br)
    preds[ci] += br.receive_extend(size)
    coef[0] = preds[ci] << al


def _block_dc_refine(br, coef, al):
    if br.get(1):
        coef[0] |= 1 << al


def _block_ac_first(br, ac, coef, ss, se, al, eobrun):
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:
                eobrun[0] = (1 << run) - 1
                if run:
                    eobrun[0] += br.get(run)
                return
            k += 16
            continue
        k += run
        if k > se:
            raise JpegUnsupported("AC band overflow")
        coef[k] = br.receive_extend(size) << al
        k += 1


def _block_ac_refine(br, ac, coef, ss, se, al, eobrun):
    """Successive-approximation refinement (T.81 G.1.2.3 decode side):
    correction bits for already-nonzero coefficients, a +-1<<Al for
    newly nonzero ones, EOB runs cover whole blocks of corrections."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if br.get(1) and (int(coef[k]) & p1) == 0:
            coef[k] += p1 if coef[k] > 0 else m1

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = ac.decode(br)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    eobrun[0] = 1 << run
                    if run:
                        eobrun[0] += br.get(run)
                    break  # rest of block handled by the EOB branch
                val = 0
            else:
                if size != 1:
                    raise JpegUnsupported("refine size != 1")
                val = p1 if br.get(1) else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def _apply_scan(scan, comps, coefs, frame):
    if scan.get("arith"):
        _apply_arith_scan(scan, comps, coefs, frame)
        return
    h, w, nc, progressive = frame[:4]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(scan["data"])
    huff = scan["huff"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    ri = scan.get("ri", 0)
    preds = [0] * nc
    eobrun = [0]
    unit = [0]  # MCUs (interleaved) / blocks (non-interleaved) decoded

    def maybe_restart():
        """Every `ri` units an RSTn marker sits in the stream: realign
        and reset the inter-block decoder state (E.2.4)."""
        if ri and unit[0] and unit[0] % ri == 0:
            br.restart()
            for i in range(nc):
                preds[i] = 0
            eobrun[0] = 0
        unit[0] += 1

    if len(scan["specs"]) == 1:
        # non-interleaved: the component's REAL block grid, raster order
        ci, td, ta = scan["specs"][0]
        c = comps[ci]
        bh, bw = _comp_block_dims(c, w, h, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                coef = coefs[ci][by][bx]
                if not progressive:
                    _block_full(br, huff[(0, td)], huff[(1, ta)],
                                coef, preds, ci)
                elif ss == 0:
                    if ah == 0:
                        _block_dc_first(br, huff[(0, td)], coef, preds,
                                        ci, al)
                    else:
                        _block_dc_refine(br, coef, al)
                elif ah == 0:
                    _block_ac_first(br, huff[(1, ta)], coef, ss, se, al,
                                    eobrun)
                else:
                    _block_ac_refine(br, huff[(1, ta)], coef, ss, se, al,
                                     eobrun)
        return
    # interleaved: MCU order (baseline full scans, progressive DC scans)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_restart()
            for ci, td, ta in scan["specs"]:
                c = comps[ci]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        coef = coefs[ci][my * c["v"] + v][mx * c["h"] + u]
                        if not progressive:
                            _block_full(br, huff[(0, td)], huff[(1, ta)],
                                        coef, preds, ci)
                        elif ss == 0 and ah == 0:
                            _block_dc_first(br, huff[(0, td)], coef,
                                            preds, ci, al)
                        elif ss == 0:
                            _block_dc_refine(br, coef, al)
                        else:
                            raise JpegUnsupported(
                                "interleaved AC scan in progressive frame")


def decode_baseline(payload: bytes) -> np.ndarray:
    """Decode a JPEG — baseline sequential (SOF0) or progressive (SOF2,
    spectral selection + successive approximation), 8-bit, 1 or 3
    components, sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0) — to
    (h, w) or (h, w, 3) uint8. Name kept for compatibility; `decode`
    is the alias that says what it now does."""
    frame, comps, qtabs, scans = _parse_stream(payload)
    h, w, nc, progressive = frame[:4]
    if progressive == "lossless":
        return _decode_lossless(frame, comps, scans)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient store on the PADDED (MCU) grid; zigzag
    # order (progressive scans address zigzag indices directly)
    coefs = [
        [[np.zeros(64, dtype=np.int64) for _ in range(mcus_x * c["h"])]
         for _ in range(mcus_y * c["v"])]
        for c in comps
    ]
    # multi-scan baseline (one non-interleaved SOS per component,
    # T.81 A.2.2) flows through the same per-scan decode as progressive:
    # the DC predictor resets per scan, each scan walks its component's
    # REAL block grid
    for scan in scans:
        _apply_scan(scan, comps, coefs, frame)

    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c in comps]
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]]
        for by, row in enumerate(coefs[ci]):
            for bx, zz in enumerate(row):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = zz
                blk = _C.T @ (coef.reshape(8, 8) * q) @ _C
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
    # upsample each component to full resolution and crop; the level
    # shift / color center / clamp all scale with the frame precision
    # (8-bit: 128/255; 12-bit extended: 2048/4095 — T.81 A.3.1)
    prec = frame[4]
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec <= 8 else np.uint16
    full = []
    for ci, c in enumerate(comps):
        p_ = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p_ = np.repeat(p_, ry, axis=0)
        if rx > 1:
            p_ = np.repeat(p_, rx, axis=1)
        full.append(p_[:h, :w] + center)
    if nc == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype)
    if nc != 3:
        raise JpegUnsupported(f"{nc}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxv).astype(dtype)


# --------------------------------------------------------------------------
# lossless (SOF3) — ITU T.81 Annex H: Huffman-coded prediction residuals,
# 2-16 bit precision, no DCT, no quantization, no color transform


def _lossless_predict(a: int, b: int, c: int, sel: int) -> int:
    """Predictor selections 1-7 (T.81 H.1.2.1); a=left, b=above,
    c=above-left."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise JpegUnsupported(f"lossless predictor {sel}")


def _decode_lossless(frame, comps, scans) -> np.ndarray:
    """SOF3 decode: per-sample Huffman SSSS category + magnitude bits
    give the prediction residual; samples reconstruct modulo 2^16
    (H.1.2.2). Components are stored untransformed (grayscale or RGB),
    so the output is exact. Restart intervals are not supported in the
    lossless path (rare in the wild; the paired encoder never emits
    them)."""
    h, w, nc, _, prec = frame
    out = np.zeros((h, w, nc), dtype=np.int64)
    seen = [False] * nc
    for scan in scans:
        if scan.get("ri"):
            raise JpegUnsupported("restart markers in lossless scan")
        sel = scan["ss"]                 # predictor selection lives in Ss
        pt = scan["al"]                  # point transform in Al
        default = 1 << (prec - 1 - pt)
        br = _BitReader(scan["data"])
        tables = {ci: scan["huff"][(0, td)] for ci, td, _ in scan["specs"]}
        order = [ci for ci, _, _ in scan["specs"]]
        for ci in order:
            seen[ci] = True

        def sample(ci: int, y: int, x: int) -> None:
            ssss = tables[ci].decode(br)
            diff = 32768 if ssss == 16 else br.receive_extend(ssss)
            if y == 0 and x == 0:
                px = default
            elif y == 0:
                px = int(out[y, x - 1, ci])          # first line: left
            elif x == 0:
                px = int(out[y - 1, x, ci])          # first column: above
            else:
                px = _lossless_predict(
                    int(out[y, x - 1, ci]), int(out[y - 1, x, ci]),
                    int(out[y - 1, x - 1, ci]), sel)
            out[y, x, ci] = (px + diff) & 0xFFFF

        # interleaved MCU order = one sample per component per position
        for y in range(h):
            for x in range(w):
                for ci in order:
                    sample(ci, y, x)
        if pt:
            for ci in order:
                out[:, :, ci] <<= pt
    if not all(seen):
        raise JpegUnsupported("lossless scan missing components")
    dtype = np.uint8 if prec <= 8 else np.uint16
    arr = out.astype(dtype)
    return arr[:, :, 0] if nc == 1 else arr


def encode_lossless(img: np.ndarray, predictor: int = 4,
                    precision: int | None = None) -> bytes:
    """Encode (h, w) or (h, w, nc<=4) uint8/uint16 as a LOSSLESS JPEG
    (SOF3, T.81 Annex H) — the archival/medical-imaging JPEG flavor:
    prediction residuals Huffman-coded per component, pixel-exact round
    trip with :func:`decode` at any precision 2-16. No DCT, no color
    transform (RGB stays RGB)."""
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError("lossless encode expects uint8 or uint16")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or not (1 <= img.shape[2] <= 4):
        raise ValueError("expected (h, w) or (h, w, 1..4)")
    h, w, nc = img.shape
    if precision is None:
        precision = 8 if img.dtype == np.uint8 else 16
    if not (2 <= precision <= 16) or int(img.max(initial=0)) >= (1 << precision):
        raise ValueError(f"samples exceed precision {precision}")
    if not (1 <= predictor <= 7):
        raise ValueError("predictor must be 1..7")
    data = img.astype(np.int64)
    default = 1 << (precision - 1)

    def residuals():
        """(component, ssss, diff) per sample in interleaved order."""
        for y in range(h):
            for x in range(w):
                for ci in range(nc):
                    if y == 0 and x == 0:
                        px = default
                    elif y == 0:
                        px = int(data[y, x - 1, ci])
                    elif x == 0:
                        px = int(data[y - 1, x, ci])
                    else:
                        px = _lossless_predict(
                            int(data[y, x - 1, ci]), int(data[y - 1, x, ci]),
                            int(data[y - 1, x - 1, ci]), predictor)
                    # residuals live mod 2^16, folded to [-32768, 32767]
                    diff = (int(data[y, x, ci]) - px) & 0xFFFF
                    if diff >= 32768:
                        diff -= 65536
                    ssss = 16 if diff == -32768 else _category(diff)
                    yield ci, ssss, diff

    syms = sorted({s for _, s, _ in residuals()})
    counts, table = _canonical_code(syms)
    bw_ = _BitWriter()
    for _, ssss, diff in residuals():
        code, ln = table[ssss]
        bw_.put(code, ln)
        if ssss and ssss != 16:
            bw_.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
    bw_.flush()

    out = bytearray(b"\xff\xd8")
    sof = bytearray(struct.pack(">BHHB", precision, h, w, nc))
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, counts, table)
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])      # Ss=predictor, Se=0, AhAl=Pt 0
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# arithmetic coding (SOF9 sequential / SOF10 progressive) — ITU T.81
# Annex D QM-coder + Annex F/G statistical models. Written from the
# standard's procedures; byte-for-byte interoperable with libjpeg(-turbo)
# in BOTH directions (tests/test_jpeg_arith.py compiles
# tests/helpers/jpegarith.c against the system libjpeg and round-trips).
# The reference decodes arithmetic JPEG through its vendored libjpeg
# (cpp/3rd_party/libtiff/tif_jpeg.c delegates); this is an independent
# from-scratch implementation of the published standard.

#: ITU T.81 Table D.3 — Qe probability estimates and the state machine
#: (NMPS/NLPS transitions, MPS switch flags). Entry 113 is the
#: non-adaptive "fixed" state (Qe≈0.37, self-looping) used for AC sign
#: and refinement decisions (F.1.4.3.1).
_QM_QE = (
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F, 0x0036,
    0x001A, 0x000D, 0x0006, 0x0003, 0x0001, 0x5A7F, 0x3F25, 0x2CF2, 0x207C,
    0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C, 0x0406, 0x0303, 0x0240,
    0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A, 0x0068, 0x004E, 0x003B, 0x002C,
    0x5AE1, 0x484C, 0x3A0D, 0x2EF1, 0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177,
    0x0E74, 0x0BFB, 0x09F8, 0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363,
    0x02D4, 0x025C, 0x01F8, 0x01A4, 0x0160, 0x0125, 0x00F6, 0x00CB, 0x00AB,
    0x008F, 0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40, 0x5832,
    0x4D1C, 0x438E, 0x3BDD, 0x34EE, 0x2EAE, 0x299A, 0x2516, 0x5570, 0x4CA9,
    0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8, 0x4F46, 0x47E5, 0x41CF,
    0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639, 0x415E, 0x5627, 0x50E7, 0x4B85,
    0x5597, 0x504F, 0x5A10, 0x5522, 0x59EB, 0x5A1D,
)
_QM_NMPS = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 9, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56,
    57, 58, 59, 60, 61, 62, 63, 32, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 77, 78, 79, 48, 81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92,
    93, 94, 86, 96, 97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103,
    109, 107, 111, 109, 111, 113,
)
_QM_NLPS = (
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36, 38, 39,
    40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60, 62, 63, 32, 33,
    37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77, 78, 79, 48, 50, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 59, 61, 61, 65, 80, 81, 82, 83, 84, 86, 87,
    87, 72, 72, 74, 74, 75, 77, 77, 80, 88, 89, 90, 91, 92, 93, 86, 88, 95,
    96, 97, 99, 99, 93, 95, 101, 102, 103, 104, 99, 105, 106, 107, 103,
    105, 108, 109, 110, 111, 110, 112, 112, 113,
)
_QM_SW = (
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0,
    0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 1, 0,
)

#: index of the fixed (non-adaptive) statistics state
_QM_FIXED = 113


class _ArithDecoder:
    """QM-coder decoder (T.81 D.2/F.2.2). Statistics bins are bytes in
    a caller-owned bytearray: low 7 bits = Table D.3 state index, bit 7
    = current MPS sense. Byte-stuffed data convention: an 0xFF data
    byte is followed by a stuffed 0x00; a bare marker ends the segment
    and further reads feed zero bytes (mirroring the encoder's
    trailing-zero discard, D.1.8)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.ended = False
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = (b0 << 24) | (b1 << 16)
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        d = self.data
        if self.ended or self.bp >= len(d):
            return 0
        b = d[self.bp]
        self.bp += 1
        if b == 0xFF:
            nxt = d[self.bp] if self.bp < len(d) else 0xD9
            if nxt == 0x00:
                self.bp += 1        # stuffed zero: data byte is 0xFF
            else:
                self.ended = True   # marker: feed zeros from now on
                self.bp -= 1
                return 0
        return b

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against statistics bin st[i]."""
        sv = st[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QM_QE[idx]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps          # fast path: no renormalization
            if self.a < qe:         # MPS/LPS conditional exchange
                d = 1 - mps
                if _QM_SW[idx]:
                    mps = 1 - mps
                idx = _QM_NLPS[idx]
            else:
                d = mps
                idx = _QM_NMPS[idx]
        else:
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                idx = _QM_NMPS[idx]
            else:
                d = 1 - mps
                if _QM_SW[idx]:
                    mps = 1 - mps
                idx = _QM_NLPS[idx]
            self.a = qe
        while True:                 # RENORMD
            if self.ct == 0:
                self.c += self._next_byte() << 8
                self.ct = 8
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        st[i] = idx | (mps << 7)
        return d


class _ArithEncoder:
    """QM-coder encoder (T.81 D.1): carry resolution via 0xFF stacking,
    0xFF00 byte stuffing, trailing zero bytes discarded at flush.
    Produces streams byte-identical to libjpeg's jcarith for the same
    decision sequence (proven in tests)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer: int | None = None  # pending byte (carry receptacle)
        self.sc = 0                     # stacked 0xFF bytes
        self.zc = 0                     # deferred zero bytes
        self.out = bytearray()

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QM_QE[idx]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:        # no exchange: LPS takes the top
                self.c += self.a
                self.a = qe
            if _QM_SW[idx]:
                mps = 1 - mps
            idx = _QM_NLPS[idx]
        else:
            if self.a & 0x8000:
                return              # fast path: no renormalization
            if self.a < qe:         # exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            idx = _QM_NMPS[idx]
        while True:                 # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break
        st[i] = idx | (mps << 7)

    def _emit_zeros(self) -> None:
        if self.zc:
            self.out += bytes(self.zc)
            self.zc = 0

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: ripple +1 into the pending byte; stacked 0xFFs
            # become zero bytes (FF + carry = 00, carry propagated)
            if self.buffer is not None:
                self._emit_zeros()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
            self.buffer = t & 0xFF  # can't be 0xFF again (spacer bits)
        elif t == 0xFF:
            self.sc += 1            # stack: may still receive a carry
        else:
            if self.buffer == 0:
                self.zc += 1        # defer zeros (trailing ones drop)
            elif self.buffer is not None:
                self._emit_zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._emit_zeros()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """D.1.8 termination: pick the in-interval code point with the
        most trailing zeros, push out the remaining bits, discard
        trailing zero bytes."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.buffer not in (None, 0):
            self._emit_zeros()
            self.out.append(self.buffer)
        if self.sc:
            self._emit_zeros()
            self.out += b"\xff\x00" * self.sc
        res = bytes(self.out)
        self.__init__()             # ready for the next restart interval
        return res


class _ArithStats:
    """Per-scan statistics: DC and AC bin arrays per table id, the DC
    conditioning contexts and predictors per component, and the shared
    fixed bin. Reset at scan starts and restart markers."""

    def __init__(self, nc: int):
        self.dc = {t: bytearray(64) for t in range(4)}
        self.ac = {t: bytearray(256) for t in range(4)}
        self.fixed = bytearray([_QM_FIXED])
        self.preds = [0] * nc
        self.dc_ctx = [0] * nc


def _arith_decode_dc(dec, stats, td, ci, L, U) -> int:
    """DC difference decode (T.81 F.2.4.1); updates the component's
    predictor and conditioning context, returns the new prediction."""
    dc = stats.dc[td]
    ctx = stats.dc_ctx[ci]
    if dec.decode(dc, ctx):
        sign = dec.decode(dc, ctx + 1)
        stx = ctx + 2 + sign
        m = dec.decode(dc, stx)
        if m:
            stx = 20                # X1 bin (Table F.4)
            while dec.decode(dc, stx):
                m <<= 1
                if m == 0x8000:
                    raise JpegUnsupported("DC magnitude overflow")
                stx += 1
        # conditioning category for the NEXT block (F.1.4.4.1.2)
        if m < ((1 << L) >> 1):
            stats.dc_ctx[ci] = 0
        elif m > ((1 << U) >> 1):
            stats.dc_ctx[ci] = 12 + sign * 4
        else:
            stats.dc_ctx[ci] = 4 + sign * 4
        v = m
        stx += 14                   # magnitude bit bins
        while m > 1:
            m >>= 1
            if dec.decode(dc, stx):
                v |= m
        v += 1
        stats.preds[ci] += -v if sign else v
    else:
        stats.dc_ctx[ci] = 0
    return stats.preds[ci]


def _arith_decode_ac(dec, stats, ta, coef, ss, se, al, kx) -> None:
    """AC band decode (T.81 F.2.4.2 / G.2 first pass): sequential when
    ss=1, se=63, al=0."""
    ac = stats.ac[ta]
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac, st):
            break                   # EOB
        while dec.decode(ac, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise JpegUnsupported("AC index overflow")
        sign = dec.decode(stats.fixed, 0)
        st += 2
        m = dec.decode(ac, st)
        if m:
            if dec.decode(ac, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(ac, st):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegUnsupported("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(ac, st):
                v |= m
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1


def _arith_dc_refine(dec, stats, coef, al) -> None:
    """Successive-approximation DC correction bit (G.2.1): fixed bin."""
    if dec.decode(stats.fixed, 0):
        coef[0] |= 1 << al


def _arith_ac_refine(dec, stats, ta, coef, ss, se, al) -> None:
    """Successive-approximation AC refinement (T.81 G.2.2)."""
    ac = stats.ac[ta]
    p1, m1 = 1 << al, -(1 << al)
    kex = 0                         # previous-stage end-of-block index
    for k in range(se, ss - 1, -1):
        if abs(int(coef[k])) >> (al + 1):
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(ac, st):
            break                   # EOB
        while True:
            cv = int(coef[k])
            if cv:
                if dec.decode(ac, st + 2):
                    coef[k] = cv + (p1 if cv > 0 else m1)
                break
            if dec.decode(ac, st + 1):
                coef[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise JpegUnsupported("AC refine overflow")
        k += 1


def _split_restart_segments(data: bytes) -> list[bytes]:
    """Split an entropy-coded segment on RSTn markers (stuffed 0xFF00
    pairs are data, everything else after 0xFF ends a chunk)."""
    segs = []
    start = 0
    i = 0
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(data[start:i])
                start = i = i + 2
                continue
        i += 1
    segs.append(data[start:])
    return segs


def _apply_arith_scan(scan, comps, coefs, frame) -> None:
    """Arithmetic twin of the Huffman scan walk in `_apply_scan`:
    same interleaved/non-interleaved traversal and progressive stage
    dispatch, QM-coded entropy. Restart markers re-initialize the
    decoder AND all statistics (F.2.1.3)."""
    h, w, nc, progressive = frame[:4]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    ri = scan.get("ri", 0)
    cond_dc = scan.get("cond_dc", {})
    cond_ac = scan.get("cond_ac", {})
    segments = _split_restart_segments(scan["data"])
    seg_iter = iter(segments)
    dec = _ArithDecoder(next(seg_iter))
    stats = _ArithStats(nc)
    unit = [0]

    def maybe_restart():
        nonlocal dec, stats
        if ri and unit[0] and unit[0] % ri == 0:
            dec = _ArithDecoder(next(seg_iter, b""))
            stats = _ArithStats(nc)
        unit[0] += 1

    def do_block(ci, td, ta, coef):
        L, U = cond_dc.get(td, (0, 1))
        kx = cond_ac.get(ta, 5)
        if not progressive:
            coef[0] = _arith_decode_dc(dec, stats, td, ci, L, U)
            _arith_decode_ac(dec, stats, ta, coef, 1, 63, 0, kx)
        elif ss == 0:
            if ah == 0:
                coef[0] = _arith_decode_dc(dec, stats, td, ci, L, U) << al
            else:
                _arith_dc_refine(dec, stats, coef, al)
        elif ah == 0:
            _arith_decode_ac(dec, stats, ta, coef, ss, se, al, kx)
        else:
            _arith_ac_refine(dec, stats, ta, coef, ss, se, al)

    if len(scan["specs"]) == 1:
        ci, td, ta = scan["specs"][0]
        c = comps[ci]
        bh, bw = _comp_block_dims(c, w, h, hmax, vmax)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                do_block(ci, td, ta, coefs[ci][by][bx])
        return
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_restart()
            for ci, td, ta in scan["specs"]:
                c = comps[ci]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        if progressive and ss != 0:
                            raise JpegUnsupported(
                                "interleaved AC scan in progressive frame")
                        do_block(ci, td, ta,
                                 coefs[ci][my * c["v"] + v][mx * c["h"] + u])


# ---- arithmetic encoders (F.1.4 sequential, G.1 progressive) ----

def _arith_encode_dc(enc, stats, td, ci, diff, L, U) -> None:
    dc = stats.dc[td]
    ctx = stats.dc_ctx[ci]
    if diff == 0:
        enc.encode(dc, ctx, 0)
        stats.dc_ctx[ci] = 0
        return
    enc.encode(dc, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dc, ctx + 1, sign)
    sz = abs(diff) - 1
    stx = ctx + 2 + sign
    if sz == 0:
        enc.encode(dc, stx, 0)
        m = 0
    else:
        enc.encode(dc, stx, 1)
        m = 1
        stx = 20
        while sz >= (m << 1):
            enc.encode(dc, stx, 1)
            m <<= 1
            stx += 1
        enc.encode(dc, stx, 0)
    if m < ((1 << L) >> 1):
        stats.dc_ctx[ci] = 0
    elif m > ((1 << U) >> 1):
        stats.dc_ctx[ci] = 12 + sign * 4
    else:
        stats.dc_ctx[ci] = 4 + sign * 4
    stx += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(dc, stx, 1 if (sz & mm) else 0)


def _arith_encode_ac(enc, stats, ta, zz, ss, se, al, kx) -> None:
    ac = stats.ac[ta]
    scaled = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    last_nz = 0
    for k in range(se, ss - 1, -1):
        if scaled[k - ss]:
            last_nz = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > last_nz:
            enc.encode(ac, st, 1)   # EOB
            return
        enc.encode(ac, st, 0)
        while scaled[k - ss] == 0:
            enc.encode(ac, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac, st + 1, 1)
        enc.encode(stats.fixed, 0, 1 if int(zz[k]) < 0 else 0)
        st += 2
        sz = scaled[k - ss] - 1
        if sz == 0:
            enc.encode(ac, st, 0)
            m = 0
        elif sz == 1:
            enc.encode(ac, st, 1)
            enc.encode(ac, st, 0)
            m = 1
        else:
            enc.encode(ac, st, 1)
            enc.encode(ac, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while sz >= (m << 1):
                enc.encode(ac, st, 1)
                m <<= 1
                st += 1
            enc.encode(ac, st, 0)
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(ac, st, 1 if (sz & mm) else 0)
        k += 1


def _arith_encode_ac_refine(enc, stats, ta, zz, ss, se, al) -> None:
    """G.1.2.3 twin of `_arith_ac_refine`."""
    ac = stats.ac[ta]
    scaled = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    ke = 0                          # last coefficient needing coding
    for k in range(se, ss - 1, -1):
        if scaled[k - ss]:
            ke = k
            break
    kex = 0                         # previous-stage end-of-block
    for k in range(ke, ss - 1, -1):
        if scaled[k - ss] >> 1:
            kex = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac, st, 0)   # not yet EOB
        while True:
            m = scaled[k - ss]
            if m > 1:               # history coefficient: correction bit
                enc.encode(ac, st + 2, m & 1)
                break
            if m == 1:              # newly significant
                enc.encode(ac, st + 1, 1)
                enc.encode(stats.fixed, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(ac, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(ac, 3 * (k - 1), 1)  # EOB


#: DAC segment for the default conditioning (L=0, U=1, Kx=5) on table
#: pair 0 — T.81 defaults, emitted explicitly like libjpeg does.
_DAC_DEFAULT = b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10,
                                                           0x10, 0x05])


def encode_arithmetic(img: np.ndarray, subsampling: str = "444",
                      restart_interval: int = 0,
                      precision: int = 8) -> bytes:
    """Encode as an ARITHMETIC-coded sequential JPEG (SOF9) — same
    quantization and block layout as `encode_baseline`, QM-coded
    entropy (no Huffman tables, ~5-10% smaller streams, single pass).
    `precision=12` emits 12-bit samples (16-bit DQT) like the SOF1
    encoder. Interoperable with libjpeg in both directions."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    img = np.asarray(img, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(img.max(initial=0)) > 4095:
        raise ValueError("12-bit samples exceed 4095")
    qtab = _QTAB if precision == 8 else _QTAB * 16
    h, w = img.shape[:2]
    planes, sampling = _to_planes(img, subsampling, precision)
    ncomp = len(planes)
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = [
        _plane_blocks(planes[ci], mcus_y * vs, mcus_x * hs, qtab)
        for ci, (hs, vs) in enumerate(sampling)
    ]
    ri = int(restart_interval)
    enc = _ArithEncoder()
    stats = _ArithStats(ncomp)
    ent = bytearray()
    rst = 0
    for m in range(mcus_y * mcus_x):
        if ri and m and m % ri == 0:
            ent += enc.flush()
            ent += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            stats = _ArithStats(ncomp)
        my, mx = divmod(m, mcus_x)
        for ci, (hs, vs) in enumerate(sampling):
            for v in range(vs):
                for u in range(hs):
                    zz = comp_blocks[ci][my * vs + v][mx * hs + u]
                    diff = int(zz[0]) - stats.preds[ci]
                    stats.preds[ci] = int(zz[0])
                    _arith_encode_dc(enc, stats, 0, ci, diff, 0, 1)
                    _arith_encode_ac(enc, stats, 0, zz, 1, 63, 0, 5)
    ent += enc.flush()

    out = bytearray(b"\xff\xd8")
    qz = qtab.reshape(64)[_ZIGZAG]
    if precision == 8:
        out += (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
                + bytes(int(x) for x in qz))
    else:
        out += (b"\xff\xdb" + struct.pack(">H", 131) + b"\x10"
                + b"".join(struct.pack(">H", int(x)) for x in qz))
    sof = bytearray(struct.pack(">BHHB", precision, h, w, ncomp))
    for ci, (hs, vs) in enumerate(sampling):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc9" + struct.pack(">H", len(sof) + 2) + sof
    out += _DAC_DEFAULT
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += ent
    out += b"\xff\xd9"
    return bytes(out)


def encode_arithmetic_progressive(img: np.ndarray,
                                  subsampling: str = "444") -> bytes:
    """Encode as an ARITHMETIC-coded progressive JPEG (SOF10) with the
    same scan script as `encode_progressive` (shifted DC first + DC
    refinement, per-component AC bands at Al=1, full-band refinement to
    Al=0), so the SOF10 decode path exercises every progressive stage.
    Decodes to pixels identical to the Huffman encoders (tested)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    planes, sampling = _to_planes(img, subsampling)
    ncomp = len(planes)
    hmax = max(hs for hs, _ in sampling)
    vmax = max(vs for _, vs in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = [
        _plane_blocks(planes[ci], mcus_y * vs, mcus_x * hs)
        for ci, (hs, vs) in enumerate(sampling)
    ]

    def dc_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (hs, vs) in enumerate(sampling):
                    for v in range(vs):
                        for u in range(hs):
                            yield ci, comp_blocks[ci][my * vs + v][mx * hs + u]

    def ac_blocks(ci):
        hs, vs = sampling[ci]
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield comp_blocks[ci][by][bx]

    scans: list[dict] = [{"kind": "dc_first", "al": 1}]
    for ci in range(ncomp):
        if ci == 0:
            scans.append({"kind": "ac_first", "ci": 0, "ss": 1, "se": 5,
                          "al": 1})
            scans.append({"kind": "ac_first", "ci": 0, "ss": 6, "se": 63,
                          "al": 1})
        else:
            scans.append({"kind": "ac_first", "ci": ci, "ss": 1, "se": 63,
                          "al": 1})
        scans.append({"kind": "ac_refine", "ci": ci, "ss": 1, "se": 63,
                      "ah": 1, "al": 0})
    scans.append({"kind": "dc_refine", "ah": 1, "al": 0})

    out = bytearray(b"\xff\xd8")
    qz = _QTAB.reshape(64)[_ZIGZAG]
    out += (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
            + bytes(int(x) for x in qz))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (hs, vs) in enumerate(sampling):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xca" + struct.pack(">H", len(sof) + 2) + sof
    out += _DAC_DEFAULT

    for sc in scans:
        enc = _ArithEncoder()
        stats = _ArithStats(ncomp)
        al = sc["al"]
        if sc["kind"] == "dc_first":
            for ci, zz in dc_blocks():
                v = int(zz[0]) >> al
                diff = v - stats.preds[ci]
                stats.preds[ci] = v
                _arith_encode_dc(enc, stats, 0, ci, diff, 0, 1)
        elif sc["kind"] == "dc_refine":
            for ci, zz in dc_blocks():
                enc.encode(stats.fixed, 0, (int(zz[0]) >> al) & 1)
        elif sc["kind"] == "ac_first":
            for zz in ac_blocks(sc["ci"]):
                _arith_encode_ac(enc, stats, 0, zz, sc["ss"], sc["se"],
                                 al, 5)
        else:
            for zz in ac_blocks(sc["ci"]):
                _arith_encode_ac_refine(enc, stats, 0, zz, sc["ss"],
                                        sc["se"], al)
        if sc["kind"] in ("dc_first", "dc_refine"):
            sos = bytearray([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, 0x00])
            ss_, se_ = 0, 0
        else:
            sos = bytearray([1, sc["ci"] + 1, 0x00])
            ss_, se_ = sc["ss"], sc["se"]
        sos += bytes([ss_, se_, (sc.get("ah", 0) << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


decode = decode_baseline
