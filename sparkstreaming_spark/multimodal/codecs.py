"""Pure-Python image codecs (no PIL/ffmpeg in this container).

Gives the multimodal pipeline a REAL decode path (`fake=False`) for
three formats, using only the standard library + NumPy:

- PPM  (P6 binary, 8-bit RGB) — decode + encode
- BMP  (uncompressed BI_RGB, 24/32-bit bottom-up) — decode + encode(24)
- PNG  (8-bit grey / grey+alpha / RGB / RGBA, non-interlaced) — decode +
  encode; inflate via stdlib zlib, all five scanline filters (None, Sub,
  Up, Average, Paeth) implemented per the PNG spec.

All decoders return an (H, W, C) uint8 array (C in {1, 2, 3, 4});
`decode_image` sniffs the magic bytes. These run inside Arrow-batched
`mapInPandas` workers — per-image Python cost is the codec itself, which
is the honest floor without native libraries; swap in PIL/libvips here
when the cluster image ships them, keeping the same call sites.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_image(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode to (H, W, C) uint8."""
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"P6" or data[:2] == b"P5":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError(f"unsupported image format (magic {data[:8]!r})")


# ---------------------------------------------------------------- PPM/PGM


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (grey) binary netpbm, 8-bit maxval."""
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError(f"only 8-bit netpbm supported (maxval {maxval})")
    ch = 3 if data[:2] == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * ch, offset=pos)
    return px.reshape(h, w, ch)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) or (H, W, 1)/(H, W) uint8 as P6/P5."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch == 3:
        head = b"P6"
    elif ch == 1:
        head = b"P5"
    else:
        raise ValueError(f"PPM needs 1 or 3 channels, got {ch}")
    return head + f"\n{w} {h}\n255\n".encode() + a.tobytes()


# -------------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP; handles bottom-up and top-down
    row order and 4-byte row padding. Returns (H, W, 3) RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp}, comp={compression})")
    h = abs(h_raw)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=pixel_off)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as bottom-up 24-bit BI_RGB."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("encode_bmp wants RGB")
    stride = (w * 3 + 3) & ~3
    bgr = a[:, :, ::-1]
    body = bytearray()
    for row in bgr[::-1]:
        body += row.tobytes()
        body += b"\x00" * (stride - w * 3)
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    head = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return head + info + bytes(body)


# -------------------------------------------------------------------- PNG


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (grey, grey+alpha, RGB, RGBA)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = None
    color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth {bit_depth})")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"palette PNG not supported (color {color_type})")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        out[y] = _unfilter_line(ftype, line, prev, nch)
        prev = out[y]
    return out.reshape(h, w, nch)


def _unfilter_line(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Undo one PNG scanline filter; `prev` is the RECONSTRUCTED prior row."""
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up
        return (line.astype(np.int32) + prev).astype(np.uint8)
    # Sub/Average/Paeth need the running reconstructed left neighbor
    cur = line.astype(np.int32)
    prv = prev.astype(np.int32)
    n = len(cur)
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = cur[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + ((left + prv[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            b = prv[i]
            c = prv[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            cur[i] = (cur[i] + pred) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter {ftype}")
    return cur.astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C in 1/2/3/4) as 8-bit non-interlaced PNG
    with filter 0 scanlines (valid PNG; suboptimal compression is fine)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) uint8 — index arithmetic only,
    deterministic across platforms (no float filtering kernels)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]
