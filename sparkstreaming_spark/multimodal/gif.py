"""Clean-room pure-Python GIF codec: the palettized-image slot of the
multimodal surface (PNG/BMP/PPM/JPEG: codecs.py + jpeg.py). GIF is
still ubiquitous in web-scraped corpora, and its LZW entropy coder is a
fundamentally different compression family from PNG's deflate and
JPEG's DCT — implementing it keeps the "decode real web images" story
honest across all three.

Scope:
- encoder: GIF89a, single image, global color table (2..256 entries),
  variable-width LSB-first LZW with CLEAR/EOI and dictionary reset at
  4096 codes, non-interlaced; `encode_gif_animation` adds multi-frame
  streams (per-frame Graphic Control Extensions with disposal method,
  centisecond delay and transparent index; sub-rectangle frames at
  offsets; NETSCAPE2.0 loop extension).
- decoder: GIF87a/89a, global and local color tables, interlaced and
  non-interlaced images, extension blocks skipped per spec, deferred
  CLEAR handling, first image frame returned as RGB;
  `decode_gif_frames` iterates EVERY frame and composes the animation
  canvas per the GIF89a disposal model (1/none: leave; 2: restore the
  frame rect to the background color; 3: restore to the previous
  canvas) honoring per-frame transparency.

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
    """GIF LZW. The dictionary is keyed by (prefix_code << 8) | symbol
    instead of materialized byte strings — the standard constant-time
    formulation (every multi-symbol string is its prefix's code plus one
    symbol, and roots ARE their own codes), byte-identical output to the
    string-keyed version at a fraction of the per-pixel cost."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    out_append = out.append
    acc = 0
    nbits = 0
    cap = 1 << _MAX_CODE_WIDTH

    table: dict[int, int] = {}
    get = table.get
    next_code = eoi + 1
    width = min_code_size + 1
    # emit(clear)
    acc |= clear << nbits
    nbits += width
    while nbits >= 8:
        out_append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    prefix = -1  # no-prefix sentinel (code 0 is a valid prefix)
    for idx in indices.ravel().tolist():
        if prefix < 0:
            prefix = idx
            continue
        key = (prefix << 8) | idx
        hit = get(key)
        if hit is not None:
            prefix = hit
            continue
        acc |= prefix << nbits
        nbits += width
        while nbits >= 8:
            out_append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        table[key] = next_code
        next_code += 1
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code == cap + 1:
            acc |= clear << nbits
            nbits += width
            while nbits >= 8:
                out_append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            table = {}
            get = table.get
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = idx
    if prefix >= 0:
        acc |= prefix << nbits
        nbits += width
        while nbits >= 8:
            out_append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= eoi << nbits
    nbits += width
    while nbits >= 8:
        out_append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    if nbits:
        out_append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW decode. Codes are pulled with ONE arithmetic op each from
    a precomputed 3-byte little-endian window table (max 12-bit code +
    7-bit phase = 19 bits < 24) instead of a per-bit loop; the table
    stores byte strings as before — entry expansion dominates and is
    already C-speed bytearray appends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # wins[i] = data[i] | data[i+1] << 8 | data[i+2] << 16
    arr = np.frombuffer(data + b"\x00\x00", dtype=np.uint8).astype(np.int32)
    wins = (arr[:-2] | (arr[1:-1] << 8) | (arr[2:] << 16)).tolist()
    pos = 0

    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table: list[bytes] = list(roots)
    append = table.append
    tlen = len(table)
    cap = 1 << _MAX_CODE_WIDTH
    width = min_code_size + 1
    mask = (1 << width) - 1
    out = bytearray()
    outlen = 0
    prev: bytes | None = None
    total_bits = len(data) * 8
    while pos + width <= total_bits and outlen < n_pixels:
        code = (wins[pos >> 3] >> (pos & 7)) & mask
        pos += width
        if code < tlen and (code < clear or table[code]):
            entry = table[code]
        elif code == clear:
            table = list(roots)
            append = table.append
            tlen = len(table)
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        elif code == eoi:
            break
        elif code == tlen and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        outlen += len(entry)
        if prev is not None and tlen < cap:
            append(prev + entry[:1])
            tlen += 1
            if tlen == mask + 1 and width < _MAX_CODE_WIDTH:
                width += 1
                mask = (1 << width) - 1
        prev = entry
    if outlen < n_pixels:
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


# ---------------------------------------------------------------------------
# Animation (GIF89a multi-frame: GCE disposal/delay/transparency, loop ext)


def _lzw_chunks(idx: np.ndarray, min_code_size: int) -> bytes:
    out = bytearray([min_code_size])
    payload = _lzw_encode(idx, min_code_size)
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    disposals: list[int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    transparents: list[int | None] | None = None,
    loop: int = 0,
    screen: tuple[int, int] | None = None,
    background: int = 0,
) -> bytes:
    """Multi-frame GIF89a. `frames` are (h, w) uint8 index arrays (each
    may be a sub-rectangle placed at offsets[i] = (top, left) on the
    logical screen), one shared global palette. Per-frame Graphic
    Control Extensions carry disposal (0-3), centisecond delay and an
    optional transparent index; a NETSCAPE2.0 application extension
    carries the loop count (0 = forever)."""
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("need an (N,3) palette with 1..256 entries")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    n_f = len(frames)
    offsets = list(offsets or [(0, 0)] * n_f)
    delays_cs = list(delays_cs or [10] * n_f)
    disposals = list(disposals or [1] * n_f)
    transparents = list(transparents or [None] * n_f)
    if not (len(offsets) == len(delays_cs) == len(disposals)
            == len(transparents) == n_f):
        raise ValueError("per-frame lists must match the frame count")
    n = len(pal)
    depth = max(1, int(n - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n] = pal
    if screen is None:
        sw = max(left + f.shape[1] for (_, left), f in zip(offsets, frames))
        sh = max(top + f.shape[0] for (top, _), f in zip(offsets, frames))
    else:
        sw, sh = screen
    for (top, left), f in zip(offsets, frames):
        if f.ndim != 2 or f.max(initial=0) >= n:
            raise ValueError("frame indices must be 2-D and within palette")
        if top + f.shape[0] > sh or left + f.shape[1] > sw:
            raise ValueError("frame rect exceeds the logical screen")
    # same fail-fast bar as frame indices: the decoder falls back to
    # black for an out-of-range background, so a bad value would
    # round-trip inconsistently instead of erroring here
    if not 0 <= background < n:
        raise ValueError("background index must be within the palette")

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", sw, sh, packed, background, 0)
    out += table.tobytes()
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop) + b"\x00")
    min_code_size = max(2, depth)
    for f, (top, left), delay, disp, ti in zip(
        frames, offsets, delays_cs, disposals, transparents
    ):
        gflags = (disp & 7) << 2 | (1 if ti is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gflags])
        out += struct.pack("<H", delay) + bytes([ti or 0, 0])
        ih, iw = f.shape
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        out += _lzw_chunks(f, min_code_size)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> dict:
    """GIF bytes → {width, height, loop, background_rgb, frames:
    [{rgb (H,W,3 composed canvas), delay_cs, disposal}]}. Composition
    follows GIF89a: the canvas starts at the background color; each
    frame draws its rect (skipping transparent-index pixels), is
    snapshotted, then its disposal runs — 0/1 leave the canvas, 2
    restores the frame rect to the background color, 3 restores the
    canvas to its pre-frame state."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    off = 13
    global_pal = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x7)
        global_pal = np.frombuffer(
            data[off : off + 3 * gct_n], dtype=np.uint8
        ).reshape(-1, 3)
        off += 3 * gct_n
    bg_rgb = (
        tuple(int(v) for v in global_pal[bg])
        if global_pal is not None and bg < len(global_pal)
        else (0, 0, 0)
    )

    def _at(i: int) -> int:
        if i >= len(data):
            raise ValueError("truncated GIF stream")
        return data[i]

    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[dict] = []
    loop = 1
    gce: dict | None = None
    while off < len(data):
        block = data[off]
        if block == 0x21:
            label = _at(off + 1)
            off += 2
            subs = []
            while _at(off):
                size = data[off]
                subs.append(data[off + 1 : off + 1 + size])
                off += 1 + size
            off += 1
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                flags, delay = subs[0][0], struct.unpack("<H", subs[0][1:3])[0]
                gce = {
                    "disposal": (flags >> 2) & 7,
                    "delay_cs": delay,
                    "transparent": subs[0][3] if flags & 1 else None,
                }
            elif (label == 0xFF and subs
                  and subs[0][:11] == b"NETSCAPE2.0"
                  and len(subs) > 1 and len(subs[1]) >= 3 and subs[1][0] == 1):
                loop = struct.unpack("<H", subs[1][1:3])[0]
        elif block == 0x2C:
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[off + 1 : off + 10]
            )
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
            if top + ih > sh or left + iw > sw:
                raise ValueError("frame rect exceeds the logical screen")
            idx = _lzw_decode(bytes(lzw), min_code_size, iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            disposal = gce["disposal"] if gce else 0
            ti = gce["transparent"] if gce else None
            delay = gce["delay_cs"] if gce else 0
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ih, left : left + iw]
            rgb = pal[idx]
            if ti is None:
                region[:] = rgb
            else:
                mask = idx != ti
                region[mask] = rgb[mask]
            frames.append(
                {"rgb": canvas.copy(), "delay_cs": delay, "disposal": disposal}
            )
            if disposal == 2:
                canvas[top : top + ih, left : left + iw] = bg_rgb
            elif disposal == 3:
                canvas = prev
            gce = None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block {block:#x}")
    return {
        "width": sw,
        "height": sh,
        "loop": loop,
        "background_rgb": bg_rgb,
        "frames": frames,
    }
