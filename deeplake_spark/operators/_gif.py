"""From-scratch GIF codec (GIF87a/GIF89a, stdlib + numpy only) — the
web-scrape image format the stdlib family (PPM/BMP/PNG/JPEG/WAV) was
missing. Decode AND encode, round-trip tested like every other codec
here (reference covers GIF via Pillow; we implement the standard:
GIF89a specification, CompuServe 1990).

Scope (the honest boundary, like _jpeg.py's):
- decode: global/local color tables, interlace, GCE transparency,
  multi-frame animations composited per the common disposal methods
  (unspecified/none/keep = draw over previous canvas; restore-to-
  background = clear the frame rect first). Restore-to-previous
  (disposal 3) raises GifUnsupported — vanishingly rare in corpora.
- encode: exact-palette images (<= 256 distinct colors — quantization
  is a modeling choice, not a codec concern), optional transparency,
  optional multi-frame animation, real variable-width LZW with
  dictionary reset (not the clear-code-spam degenerate form).
"""

from __future__ import annotations

import struct

import numpy as np


class GifUnsupported(Exception):
    """Valid GIF outside this decoder's documented scope."""


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF-flavor LZW (variable 3..12-bit codes, LSB-first bit packing,
    CLEAR resets the dictionary) → index stream of n_expected bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as a list of byte strings; codes < clear are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out[:n_expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return bytes(out[:n_expected])
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Inverse of _lzw_decode: real dictionary-building LZW with a
    CLEAR emitted when the table fills at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            # widen when the NEXT code to assign no longer fits
            if next_code == (1 << width):
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    return rows[order]


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos:pos + n]
        pos += n


def decode_gif(payload: bytes):
    """GIF bytes → list of (frame ndarray, delay_cs). Frames are RGB
    uint8 (h, w, 3) — or RGBA when any frame declares a transparent
    index — composited onto the logical-screen canvas."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    any_trans = False
    # first pass: detect transparency anywhere (output dtype decision)
    scan = pos
    while scan < len(payload):
        b0 = payload[scan]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = payload[scan + 1]
            if label == 0xF9 and payload[scan + 3] & 0x01:
                any_trans = True
            scan += 2
            _, scan = _read_subblocks(payload, scan)
        elif b0 == 0x2C:
            ip = payload[scan + 9]
            scan += 10
            if ip & 0x80:
                scan += (2 << (ip & 0x07)) * 3
            scan += 1
            _, scan = _read_subblocks(payload, scan)
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    channels = 4 if any_trans else 3
    canvas = np.zeros((h, w, channels), np.uint8)
    frames: list[tuple[np.ndarray, int]] = []
    trans_idx = -1
    delay = 0
    disposal = 0
    # disposal applies AFTER a frame is displayed: the previous frame's
    # disposal-2 restores ITS rect to background before the next frame
    # draws (GIF89a §23; the frame itself shows with its content)
    prev_disposal = 0
    prev_rect = (0, 0, 0, 0)
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = payload[pos + 1]
            pos += 2
            block, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(block) >= 4:
                flags = block[0]
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise GifUnsupported(
                        "restore-to-previous disposal not supported")
                delay = block[1] | (block[2] << 8)
                trans_idx = block[3] if flags & 0x01 else -1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        left, top, fw, fh, ip = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if ip & 0x80:
            n = 2 << (ip & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame without a color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idxs = np.frombuffer(
            _lzw_decode(data, mcs, fw * fh), np.uint8).reshape(fh, fw)
        if ip & 0x40:
            idxs = _deinterlace(idxs)
        rgb = ct[np.minimum(idxs, len(ct) - 1)]
        if prev_disposal == 2:
            pl, pt, pw, ph = prev_rect
            canvas[pt:pt + ph, pl:pl + pw] = 0
        region = canvas[top:top + fh, left:left + fw]
        if channels == 4:
            opaque = (idxs != trans_idx) if trans_idx >= 0 else \
                np.ones(idxs.shape, bool)
            region[opaque] = np.concatenate(
                [rgb[opaque], np.full((opaque.sum(), 1), 255, np.uint8)],
                axis=1)
        else:
            region[...] = rgb
        frames.append((canvas.copy(), delay))
        prev_disposal, prev_rect = disposal, (left, top, fw, fh)
        # a GCE governs only the single rendering block that follows
        # (GIF89a §23): reset for the next frame
        trans_idx, delay, disposal = -1, 0, 0
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def decode_gif_image(payload: bytes) -> np.ndarray:
    """First composited frame — the image-decode entry point."""
    return decode_gif(payload)[0][0]


def encode_gif(frames, delays_cs=None, interlace: bool = False,
               transparent=None) -> bytes:
    """RGB(A) uint8 frame(s) → GIF89a bytes. Every frame must use at
    most 256 distinct colors (exact palette — quantize upstream);
    RGBA input maps zero-alpha pixels to a transparent index. Fixed
    header/order metadata: identical input → identical bytes."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all GIF frames must share the canvas size")
    delays = list(delays_cs or [0] * len(frames))
    rgba = frames[0].ndim == 3 and frames[0].shape[2] == 4
    # exact global palette over all frames, deterministic order
    flat = np.concatenate(
        [f[..., :3].reshape(-1, 3) for f in frames], axis=0)
    palette = np.unique(flat, axis=0)
    has_trans = rgba and any(
        (f[..., 3] == 0).any() for f in frames)
    n_slots = len(palette) + (1 if has_trans else 0)
    if n_slots > 256:
        raise GifUnsupported(
            f"{len(palette)} distinct colors; the exact-palette encoder "
            "takes <= 256 — quantize upstream")
    size_pow = max(1, int(np.ceil(np.log2(max(2, n_slots)))))
    table = np.zeros((1 << size_pow, 3), np.uint8)
    table[:len(palette)] = palette
    trans_idx = len(palette) if has_trans else -1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_pow - 1) & 0x07), 0, 0)
    out += table.tobytes()
    # vectorized color -> index: pack RGB into uint32 keys; np.unique's
    # lexicographic palette order makes the packed keys ascending, so
    # searchsorted IS the lookup (a per-pixel Python dict would cost
    # ~2M interpreter round trips per 1080p frame)
    packed_pal = ((palette[:, 0].astype(np.uint32) << 16)
                  | (palette[:, 1].astype(np.uint32) << 8)
                  | palette[:, 2])
    mcs = max(2, size_pow)
    for f, delay in zip(frames, delays):
        if len(frames) > 1 or has_trans:
            flags = 0x01 if has_trans else 0x00
            out += bytes([0x21, 0xF9, 4, flags,
                          delay & 0xFF, (delay >> 8) & 0xFF,
                          trans_idx if has_trans else 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0x00)
        rgb = f[..., :3]
        packed = ((rgb[..., 0].astype(np.uint32) << 16)
                  | (rgb[..., 1].astype(np.uint32) << 8)
                  | rgb[..., 2])
        idxs = np.searchsorted(packed_pal, packed.ravel()) \
            .astype(np.uint8).reshape(h, w)
        if rgba and has_trans:
            idxs[f[..., 3] == 0] = trans_idx
        if interlace:
            idxs = _interlace(idxs)
        out.append(mcs)
        comp = _lzw_encode(idxs.tobytes(), mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
