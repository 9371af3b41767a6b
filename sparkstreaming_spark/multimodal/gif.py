"""Clean-room pure-Python GIF codec: the palettized-image slot of the
multimodal surface (PNG/BMP/PPM/JPEG: codecs.py + jpeg.py). GIF is
still ubiquitous in web-scraped corpora, and its LZW entropy coder is a
fundamentally different compression family from PNG's deflate and
JPEG's DCT — implementing it keeps the "decode real web images" story
honest across all three.

Scope:
- encoder: GIF89a, single image, global color table (2..256 entries),
  variable-width LSB-first LZW with CLEAR/EOI and dictionary reset at
  4096 codes, non-interlaced.
- decoder: GIF87a/89a, global and local color tables, interlaced and
  non-interlaced images, extension blocks skipped per spec, deferred
  CLEAR handling, first image frame returned as RGB.

Reference parity: the reference repo has no image path (three Spark
jobs over CSV); this is north-star multimodal extension work. Spark
plumbing lives in suite/platform_ops.py::q_gif_probe — Arrow
mapInPandas, embarrassingly parallel, scales by input splits.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, CLEAR/EOI codes, 12-bit cap)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for idx in indices.ravel():
        sym = bytes([int(idx)])
        cand = prefix + sym
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code == (1 << _MAX_CODE_WIDTH) + 1:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        out = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            out |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return out

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    total_bits = len(data) * 8
    while pos + width <= total_bits and len(out) < n_pixels:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended before the image was complete")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


# ---------------------------------------------------------------------------
# Container


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 palette indices + (N, 3) uint8 palette → GIF89a bytes."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("need (H,W) indices and (N,3) palette")
    n = len(pal)
    if n < 1 or n > 256 or idx.max(initial=0) >= n:
        raise ValueError("palette must cover all indices (1..256 entries)")
    depth = max(1, int(n - 1).bit_length())  # table size = 2^depth >= n
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n] = pal
    h, w = idx.shape

    out = bytearray(b"GIF89a")
    # logical screen: global color table flag, color resolution, size
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    payload = _lzw_encode(idx, min_code_size)
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ((H, W) uint8 indices, (N, 3) uint8 palette) for the
    first image frame. Use `decode_gif_rgb` for the composed pixels."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    off = 13
    global_pal = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x7)
        global_pal = np.frombuffer(
            data[off : off + 3 * gct_n], dtype=np.uint8
        ).reshape(-1, 3)
        off += 3 * gct_n
    def _at(i: int) -> int:
        if i >= len(data):
            raise ValueError("truncated GIF stream")
        return data[i]

    while off < len(data):
        block = data[off]
        if block == 0x21:  # extension: label + sub-blocks
            off += 2
            while _at(off):
                off += 1 + data[off]
            off += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", data[off + 1 : off + 10])
            off += 10
            pal = global_pal
            if ipacked & 0x80:
                lct_n = 2 << (ipacked & 0x7)
                pal = np.frombuffer(
                    data[off : off + 3 * lct_n], dtype=np.uint8
                ).reshape(-1, 3)
                off += 3 * lct_n
            if pal is None:
                raise ValueError("image has no color table")
            min_code_size = _at(off)
            off += 1
            lzw = bytearray()
            while _at(off):
                size = data[off]
                lzw += data[off + 1 : off + 1 + size]
                off += 1 + size
            off += 1
            idx = _lzw_decode(bytes(lzw), min_code_size, iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            return idx, pal.copy()
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block {block:#x}")
    raise ValueError("GIF stream contains no image")


def decode_gif_rgb(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB array (first frame)."""
    idx, pal = decode_gif(data)
    return pal[idx]
