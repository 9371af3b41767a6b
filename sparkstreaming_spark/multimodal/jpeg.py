"""Pure-Python baseline JPEG (ITU-T T.81) codec — the MJPEG payload.

Closes the "compressed video" slot the same way PNG (codecs.py) and
IMA-ADPCM (audio.py) were closed: a clean-room implementation of the
PUBLIC baseline-JPEG spec, so `decode_avi_frames` can demux MJPG AVIs —
the most common compressed AVI fourcc from capture tools — without an
external ffmpeg. Scope is baseline sequential DCT only:

- decode: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI; 8-bit samples;
  1 or 3 components; arbitrary h×v sampling factors (4:4:4, 4:2:2,
  4:2:0 all fall out of the generic MCU walk); restart intervals.
- encode: interleaved single scan at 4:4:4, 4:2:2 or 4:2:0 (luma
  sampling factors), optional DRI/RSTn restart markers, with the spec's
  Annex-K example quantization + Huffman tables (quality-scaled) —
  enough to build real MJPEG fixtures covering every decoder path and
  verify decode against an analytic source signal.

Progressive (SOF2), arithmetic coding, and 12-bit are out of scope and
raise NotImplementedError with the marker named.

Scale note: this codec runs INSIDE Arrow-batched mapInPandas over blob
columns; per-block Python is fine for the thumbnail-sized probe frames
tested here, and at 100 TB the decode stage is an embarrassingly
parallel narrow map — swapping in a native decoder changes only this
module, not the Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order (T.81 figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example quantization tables (luminance / chrominance)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K example Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16)
_DCT[0] *= 1 / np.sqrt(2)
_DCT *= 0.5  # orthonormal scaling


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman: returns (decode dict {(length, code): symbol},
    encode dict {symbol: (length, code)})."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-coded-segment reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (RST/EOI) and reports its position."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                b = 0  # feed zeros past the end (never consumed validly)
                self.pos = self.pos  # stay on the marker
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial bits, return the marker byte just hit (if any)
        and step past it."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # scan forward to the FF xx marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        return None


def _decode_huff_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1: map 'size'-bit raw value to signed coefficient
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    out = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tab = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tab.astype(np.int64)
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)], _ = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = []  # (comp_index, dc_table, ac_table)
            for c in range(ns):
                cs, tda = body[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    i for i, cm in enumerate(frame[2]) if cm[0] == cs
                )
                scan.append((ci, tda >> 4, tda & 0xF))
            h, w, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            planes = [
                np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps
            ]
            br = _BitReader(data, pos + seglen)
            pred = [0] * len(comps)
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_count
                        and mcu_count % restart_interval == 0
                    ):
                        m = br.align_to_marker()
                        if m is None or not (0xD0 <= m <= 0xD7):
                            raise ValueError("expected RST marker")
                        pred = [0] * len(comps)
                    for ci, tdc, tac in scan:
                        _cid, hs, vs, tq = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = _decode_block(
                                    br,
                                    htables[(0, tdc)],
                                    htables[(1, tac)],
                                    qtables[tq],
                                    pred,
                                    ci,
                                )
                                y0 = (my * vs + by) * 8
                                x0 = (mx * hs + bx) * 8
                                planes[ci][
                                    y0 : y0 + 8, x0 : x0 + 8
                                ] = blk
                    mcu_count += 1
            # upsample to full resolution and crop
            full = []
            for (cid, hs, vs, tq), pl in zip(comps, planes):
                rep_y = vmax // vs
                rep_x = hmax // hs
                up = np.repeat(np.repeat(pl, rep_y, axis=0), rep_x, axis=1)
                full.append(up[:h, :w])
            if len(full) == 1:
                y = np.clip(full[0], 0, 255)
                out = np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
            else:
                y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
                r = y + 1.402 * cr
                g = y - 0.344136 * cb - 0.714136 * cr
                b = y + 1.772 * cb
                out = np.clip(
                    np.stack([r, g, b], axis=2), 0, 255
                ).astype(np.uint8)
            # step past the entropy segment for any trailing markers
            pos = br.pos
            continue
        pos += seglen
    if out is None:
        raise ValueError("no scan decoded")
    return out


def _decode_block(br, dc_table, ac_table, qt, pred, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_huff_symbol(br, dc_table)
    diff = _extend(br.read_bits(s), s) if s else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff_symbol(br, ac_table)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
    return _idct(coef.reshape(8, 8)) + 128.0


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG bytes, single interleaved scan.

    `subsampling` is the LUMA sampling factor pair (hs, vs): (1, 1) =
    4:4:4, (2, 1) = 4:2:2, (2, 2) = 4:2:0 (chroma is always 1×1, box-
    averaged). `restart_interval` > 0 emits DRI + RSTn markers every
    that many MCUs — the layout hardware MJPEG encoders produce, so the
    decoder's restart path gets a real fixture."""
    hs, vs = subsampling
    if (hs, vs) not in ((1, 1), (2, 1), (2, 2)):
        raise ValueError("subsampling must be (1,1), (2,1) or (2,2)")
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape[:2]
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    _, dc_l = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    _, ac_l = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    _, dc_c = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
    _, ac_c = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # pad to MCU multiples by edge replication
    mh, mw = 8 * vs, 8 * hs
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y = pad(y)
    # chroma: box-average hs×vs neighborhoods down to one sample
    def down(p):
        p = pad(p)
        return p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))

    cbd, crd = down(cb), down(cr)

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcuy, mcux = ph // mh, pw // mw
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    _enc_one(bw, y[y0:y0 + 8, x0:x0 + 8], ql, pred, 0,
                             dc_l, ac_l)
            _enc_one(bw, cbd[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], qc,
                     pred, 1, dc_c, ac_c)
            _enc_one(bw, crd[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], qc,
                     pred, 2, dc_c, ac_c)
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        return seg(0xDB, bytes([tid]) + zz)

    def dht(tc: int, th: int, bits, vals) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if (
        restart_interval) else b""
    return (
        b"\xff\xd8"
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + dri
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _enc_one(bw, block, qt, pred, ci, dct, act) -> None:
    coef = _fdct(block - 128.0)
    q = np.round(coef / qt).astype(np.int64)
    _encode_block(bw, q.reshape(-1)[ZIGZAG], pred, ci, dct, act)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw, zz, pred, ci, dc_table, ac_table) -> None:
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s = _size_cat(diff)
    ln, code = dc_table[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_table[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _size_cat(v)
        ln, code = ac_table[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_table[0x00]  # EOB
        bw.write(code, ln)
