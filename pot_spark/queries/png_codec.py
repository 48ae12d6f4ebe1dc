"""Minimal pure-stdlib PNG codec (zlib + struct): 8-bit grayscale and
RGB, non-interlaced — the real-decode fallback for environments without
PIL (this container), so the multimodal feature pipeline can run over
ACTUAL pixels, not only the deterministic byte stub.

Spec coverage (PNG is a public W3C spec, https://www.w3.org/TR/png-3/):
IHDR/IDAT/IEND chunks, bit depth 8, color types 0 (grayscale) and 2
(RGB), all five scanline filters (None/Sub/Up/Average/Paeth) on DECODE,
selectable filter on ENCODE (so tests can exercise every unfilter
branch). Anything else (palette, alpha, 16-bit, interlace) raises
``ValueError`` — a loud skip beats silent garbage pixels, same contract
as udfs._decode_payload.

The RGB→L conversion uses PIL's exact integer form of ITU-R 601-2
(L = (R*19595 + G*38470 + B*7471 + 2^15) >> 16), so the fallback is
bit-identical to ``PIL.Image.convert("L")`` where both exist.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (H, W) grayscale or (H, W, 3) RGB uint8 array. The same
    ``filter_type`` (0..4) is applied to every scanline — parameterized
    so tests can drive each of decode's unfilter branches."""
    if arr.dtype != np.uint8:
        raise ValueError("uint8 pixels only")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError("expected (H,W) grayscale or (H,W,3) RGB")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    raw = arr.reshape(h, w * channels)
    bpp = channels  # bytes per pixel at bit depth 8
    out = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        line = raw[y].astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        up = prev.astype(np.int32)
        upleft = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - up
        elif filter_type == 3:
            filt = line - (left + up) // 2
        else:  # Paeth
            filt = line - _paeth(left, up, upleft)
        out.append(filter_type)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = raw[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """Decode to a (H, W) or (H, W, 3) uint8 array. Handles every
    scanline filter; rejects features outside the supported profile."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG profile (depth={depth}, "
                    f"color_type={color_type}, interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = line + up
        elif ftype == 1:
            # Sub's recurrence rec[x] = (line[x] + rec[x-bpp]) mod 256 is
            # a per-channel prefix sum, and mod distributes over sums —
            # vectorized exactly (the r12 defilter rewrite: the old
            # per-pixel loop was the measured hot spot of every
            # multimodal decode)
            rec = np.empty(stride, dtype=np.int64)
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(line[c::bpp], dtype=np.int64)
        elif ftype in (3, 4):
            # Average's floor-div and Paeth's comparisons operate on the
            # REDUCED reconstructed neighbors per spec (neither commutes
            # with a deferred mod), so these stay sequential — but in
            # pure ints: the previous per-pixel numpy scalar/array ops
            # cost ~10x (three array allocations per Paeth pixel)
            line_l = line.tolist()
            up_l = up.tolist()
            rec_l = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    left = rec_l[x - bpp] if x >= bpp else 0
                    rec_l[x] = (line_l[x] + ((left + up_l[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    left = rec_l[x - bpp] if x >= bpp else 0
                    upleft = up_l[x - bpp] if x >= bpp else 0
                    b = up_l[x]
                    p = left + b - upleft
                    pa = p - left if p >= left else left - p
                    pb = p - b if p >= b else b - p
                    pc = p - upleft if p >= upleft else upleft - p
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = upleft
                    rec_l[x] = (line_l[x] + pred) & 255
            rec = np.asarray(rec_l, dtype=np.int64)
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = (rec % 256).astype(np.uint8)
    return out.reshape(height, width) if channels == 1 else out.reshape(
        height, width, 3
    )


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """(H, W[, 3]) uint8 -> (H, W) uint8 luma, PIL's exact integer
    ITU-R 601-2 form — bit-identical to Image.convert("L")."""
    if arr.ndim == 2:
        return arr
    r = arr[..., 0].astype(np.int64)
    g = arr[..., 1].astype(np.int64)
    b = arr[..., 2].astype(np.int64)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )
