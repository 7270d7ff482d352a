"""Arithmetic-coded JPEG (SOF9/SOF10, T.81 Annex D QM-coder + Annex
F/G models) — round-trip self-consistency plus THIRD-PARTY interop:
when gcc and the system libjpeg headers are present, a small C harness
(tests/helpers/jpegarith.c) is compiled and both directions are proven
coefficient-exact against libjpeg's own arithmetic codec.

Reference parity: the reference decodes arithmetic JPEG through its
vendored libjpeg (cpp/3rd_party/libtiff/tif_jpeg.c); ours is a
from-scratch implementation of the published standard.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from deeplake_spark.operators import _jpeg as J


def _img(shape, seed=5):
    rng = np.random.default_rng(seed)
    return ((rng.integers(0, 256, shape).astype(float)) * 0.5 + 64).astype(
        np.uint8)


# --------------------------------------------------------------------------
# round-trip: arithmetic entropy coding is lossless over the SAME
# quantized coefficients the Huffman encoders produce, so decoded
# pixels must be IDENTICAL to the baseline encoder's.

@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_arith_sequential_matches_baseline_pixels(sub):
    img = _img((37, 53, 3))
    assert np.array_equal(
        J.decode(J.encode_arithmetic(img, sub)),
        J.decode(J.encode_baseline(img, sub)))


def test_arith_grayscale_and_restart_intervals():
    img = _img((45, 61, 3), seed=9)
    gray = img[..., 0].copy()
    assert np.array_equal(
        J.decode(J.encode_arithmetic(gray)),
        J.decode(J.encode_baseline(gray)))
    assert np.array_equal(
        J.decode(J.encode_arithmetic(img, "420", restart_interval=3)),
        J.decode(J.encode_baseline(img, "420")))


def test_arith_12bit_sequential():
    rng = np.random.default_rng(3)
    img12 = rng.integers(0, 4096, (24, 32)).astype(np.uint16)
    out = J.decode(J.encode_arithmetic(img12, precision=12))
    assert out.dtype == np.uint16
    assert np.array_equal(out, J.decode(J.encode_baseline(img12,
                                                          precision=12)))


@pytest.mark.parametrize("sub", ["444", "420"])
def test_arith_progressive_matches_baseline_pixels(sub):
    img = _img((37, 53, 3), seed=7)
    assert np.array_equal(
        J.decode(J.encode_arithmetic_progressive(img, sub)),
        J.decode(J.encode_baseline(img, sub)))


def test_arith_stream_is_smaller_than_huffman():
    # the QM coder's selling point; also catches gross stuffing bugs
    img = _img((64, 96, 3), seed=1)
    assert len(J.encode_arithmetic(img, "420")) < len(
        J.encode_baseline(img, "420"))


def test_arith_truncated_stream_fails_or_degrades_gracefully():
    data = J.encode_arithmetic(_img((24, 24)))
    # header-truncated: must raise, not crash
    with pytest.raises(Exception):
        J.decode(data[:20])
    # entropy-truncated: decoder feeds zeros past the end (D.1.8
    # mirror) — must return an image of the right shape, not crash
    out = J.decode(data[:len(data) - 8] + b"\xff\xd9")
    assert out.shape == (24, 24)


def test_arith_decode_via_multimodal_dispatch():
    from deeplake_spark.operators.multimodal import _decode_one
    img = _img((16, 24, 3), seed=2)
    data = J.encode_arithmetic(img, "444")
    out = _decode_one(data, "jpeg", strict=True)
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, J.decode(data))


def test_qm_coder_roundtrips_random_decision_sequences():
    """Property fuzz of the QM coder core independent of JPEG
    structure: random binary decisions against random context bins
    (shared state arrays, skewed and unskewed streams) must decode
    back exactly, and the emitted stream must keep the byte-stuffing
    invariant (0xFF always followed by 0x00 inside entropy data) that
    the marker scan relies on. Long all-ones runs drive the
    0xFF-stacking + carry paths single-image tests rarely reach."""
    rng = np.random.default_rng(42)
    for trial in range(24):
        n_ctx = int(rng.integers(1, 16))
        n = int(rng.integers(1, 4000))
        p1 = float(rng.uniform(0.02, 0.98))
        bits = (rng.random(n) < p1).astype(int).tolist()
        if trial % 4 == 0:
            bits += [1] * int(rng.integers(100, 1200))  # carry stress
        ctxs = rng.integers(0, n_ctx, len(bits)).tolist()
        enc = J._ArithEncoder()
        st_e = bytearray(n_ctx)
        for c, b in zip(ctxs, bits):
            enc.encode(st_e, c, b)
        data = enc.flush()
        for i, byte in enumerate(data[:-1]):
            if byte == 0xFF:
                assert data[i + 1] == 0x00, f"unstuffed FF at {i}"
        dec = J._ArithDecoder(data)
        st_d = bytearray(n_ctx)
        got = [dec.decode(st_d, c) for c in ctxs]
        assert got == bits, f"trial {trial} diverged"


# --------------------------------------------------------------------------
# third-party interop against the system libjpeg(-turbo)

_HELPER_SRC = os.path.join(os.path.dirname(__file__), "helpers",
                           "jpegarith.c")
_have_toolchain = (shutil.which("gcc") is not None
                   and os.path.exists("/usr/include/jpeglib.h"))

needs_libjpeg = pytest.mark.skipif(
    not _have_toolchain, reason="gcc + libjpeg headers not available")


@pytest.fixture(scope="session")
def jpegarith(tmp_path_factory):
    exe = tmp_path_factory.mktemp("jpegarith") / "jpegarith"
    subprocess.run(["gcc", "-O2", "-o", str(exe), _HELPER_SRC, "-ljpeg"],
                   check=True)
    return str(exe)


def _libjpeg_coefs(exe, jpg_path):
    """libjpeg's own entropy decode of a file, as {(ci,by,bx): zigzag}."""
    out = subprocess.run([exe, "coef", jpg_path], check=True,
                         capture_output=True, text=True).stdout
    blocks = {}
    for line in out.splitlines():
        p = line.split()
        nat = np.array([int(x) for x in p[3:]], dtype=np.int64)
        blocks[(int(p[0]), int(p[1]), int(p[2]))] = nat[J._ZIGZAG]
    return blocks


def _our_coefs(jpg_path):
    """Our entropy decode of a file (same representation)."""
    payload = open(jpg_path, "rb").read()
    frame, comps, qtabs, scans = J._parse_stream(payload)
    h, w = frame[0], frame[1]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = [
        [[np.zeros(64, dtype=np.int64) for _ in range(mx * c["h"])]
         for _ in range(my * c["v"])]
        for c in comps
    ]
    for scan in scans:
        J._apply_scan(scan, comps, coefs, frame)
    return coefs


def _assert_coef_match(ours, theirs):
    assert theirs, "no blocks decoded by libjpeg"
    for (ci, by, bx), zz in theirs.items():
        assert np.array_equal(ours[ci][by][bx], zz), (ci, by, bx)


@needs_libjpeg
@pytest.mark.parametrize("progressive", [0, 1])
@pytest.mark.parametrize("color", [True, False])
def test_libjpeg_arith_decodes_exactly(jpegarith, tmp_path, progressive,
                                       color):
    """libjpeg-encoded arithmetic streams (sequential AND progressive,
    color 4:2:0 with two conditioning-table pairs AND grayscale)
    entropy-decode to the EXACT same coefficients in our decoder."""
    img = _img((48, 64, 3) if color else (48, 64), seed=11)
    pnm = tmp_path / ("t.ppm" if color else "t.pgm")
    hdr = b"P6" if color else b"P5"
    pnm.write_bytes(hdr + b"\n64 48\n255\n" + img.tobytes())
    jpg = tmp_path / "t.jpg"
    subprocess.run([jpegarith, "enc", str(pnm), str(jpg), "82",
                    str(progressive)], check=True)
    _assert_coef_match(_our_coefs(str(jpg)),
                       _libjpeg_coefs(jpegarith, str(jpg)))


@needs_libjpeg
@pytest.mark.parametrize("kind", ["seq444", "seq420", "seq_ri", "prog444",
                                  "prog420", "gray"])
def test_libjpeg_reads_our_arith_streams_exactly(jpegarith, tmp_path, kind):
    """Our arithmetic encoders produce streams libjpeg entropy-decodes
    to the EXACT coefficients our own decoder reads — proving the
    emitted byte stream (stuffing, carries, restarts, flush) is
    standard-compliant, not merely self-consistent."""
    img = _img((45, 61, 3), seed=13)
    data = {
        "seq444": lambda: J.encode_arithmetic(img, "444"),
        "seq420": lambda: J.encode_arithmetic(img, "420"),
        "seq_ri": lambda: J.encode_arithmetic(img, "420",
                                              restart_interval=4),
        "prog444": lambda: J.encode_arithmetic_progressive(img, "444"),
        "prog420": lambda: J.encode_arithmetic_progressive(img, "420"),
        "gray": lambda: J.encode_arithmetic(img[..., 0].copy()),
    }[kind]()
    jpg = tmp_path / "ours.jpg"
    jpg.write_bytes(data)
    _assert_coef_match(_our_coefs(str(jpg)),
                       _libjpeg_coefs(jpegarith, str(jpg)))


@needs_libjpeg
def test_encoder_is_byte_identical_to_libjpeg_for_same_decisions(
        jpegarith, tmp_path):
    """Strongest claim: driving our QM encoder with libjpeg's exact
    quantized coefficients reproduces libjpeg's entropy bytes
    byte-for-byte (grayscale single-table case)."""
    img = _img((32, 40), seed=17)
    pnm = tmp_path / "g.pgm"
    pnm.write_bytes(b"P5\n40 32\n255\n" + img.tobytes())
    jpg = tmp_path / "g.jpg"
    subprocess.run([jpegarith, "enc", str(pnm), str(jpg), "80", "0"],
                   check=True)
    blocks = _libjpeg_coefs(jpegarith, str(jpg))
    bh = max(by for _, by, _ in blocks) + 1
    bw = max(bx for _, _, bx in blocks) + 1
    enc = J._ArithEncoder()
    stats = J._ArithStats(1)
    for by in range(bh):
        for bx in range(bw):
            zz = blocks[(0, by, bx)]
            diff = int(zz[0]) - stats.preds[0]
            stats.preds[0] = int(zz[0])
            J._arith_encode_dc(enc, stats, 0, 0, diff, 0, 1)
            J._arith_encode_ac(enc, stats, 0, zz, 1, 63, 0, 5)
    mine = enc.flush()
    payload = jpg.read_bytes()
    import struct
    i = payload.find(b"\xff\xda")
    seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
    ref = payload[i + 2 + seglen:-2]
    assert mine == ref
