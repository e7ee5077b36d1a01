"""Pure-stdlib baseline JPEG codec (round 5 — VERDICT r4 "Next round #5").

JPEG is the workhorse web-image format; a crawl-scale media pipeline that
cannot decode it leaves most of the image corpus un-fingerprinted. This
module implements BASELINE SEQUENTIAL JPEG (ITU-T T.81) from the spec, in
numpy + stdlib only:

* decoder (`jpeg_pixels`): marker parse (DQT/SOF0/SOF1/DHT/DRI/SOS),
  canonical Huffman entropy decode, dequantize + de-zigzag, 8×8 IDCT as
  two matrix multiplies, chroma upsampling for 4:4:4 / 4:2:2 / 4:4:0 /
  4:2:0, restart-marker segments, YCbCr→RGB;
* encoder (`encode_baseline`): the inverse pipeline with the T.81 Annex K
  example quantization + Huffman tables (the tables virtually every
  encoder ships), quality scaling per the IJG curve, optional 4:2:0.

Boundary contract (same as the PNG codec, `multimodal.py::png_pixels`):
unsupported-but-valid variants — progressive (SOF2), arithmetic coding
(SOF9+), hierarchical, 12-bit — raise ``NotImplementedError``; structural
corruption raises ``ValueError``. Callers (the dHash path, feature
extraction) map ALL decode errors to NULL rows — the corrupt-media
contract: a bad payload becomes an un-fingerprinted singleton, never task
death.

Scale shape: decode runs inside Arrow-batched ``mapInPandas`` workers
(`imagedup.image_dhash`, `multimodal.decode_features`); per-image cost is
O(pixels) with the hot loops (IDCT, upsample, color transform) vectorized
— the only per-symbol Python loop is the Huffman walk, bounded by the
entropy-coded size. Everything here is per-row worker code: no driver
state, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_pixels", "encode_baseline"]

# Zig-zag order: _ZZ[i] = natural (row-major) index of the i-th coefficient
# in zig-zag order (T.81 Figure 5).
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: _T[u, x] = c(u)/2 * cos((2x+1)uπ/16).
# IDCT: spatial = _T.T @ F @ _T ; FDCT: F = _T @ spatial @ _T.T
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over one (already unstuffed) entropy segment."""

    __slots__ = ("d", "i", "b", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.b = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.i >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            self.b = (self.b << 8) | self.d[self.i]
            self.i += 1
            self.n += 8
        self.n -= k
        out = (self.b >> self.n) & ((1 << k) - 1)
        # Mask the accumulator to its live bits: without this it grows one
        # byte per fill forever and every subsequent shift is O(stream) —
        # quadratic decode on a multi-MB crawl JPEG.
        self.b &= (1 << self.n) - 1
        return out


def _build_huff(bits_counts: bytes, values: bytes) -> dict:
    """Canonical Huffman map {(length, code): symbol} from the DHT BITS /
    HUFFVAL lists (T.81 Annex C code assignment)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read(1)
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_block(
    bits: _Bits, dc_tab: dict, ac_tab: dict, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    """One 8×8 block: huffman → zigzag coefficients → dequantize →
    de-zigzag → IDCT. Returns (spatial block float64, new DC pred)."""
    s = _huff_decode(bits, dc_tab)
    if s > 11:
        raise ValueError("DC magnitude category out of range")
    pred += _extend(bits.read(s), s) if s else 0
    zz = np.zeros(64, np.int32)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient run overflows block")
        zz[k] = _extend(bits.read(s), s)
        k += 1
    coef = np.zeros(64, np.float64)
    coef[_ZZ] = zz * qt  # dequantize in zigzag order, scatter to natural
    return _T.T @ coef.reshape(8, 8) @ _T, pred


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded scan into restart segments, unstuffing
    FF00. Returns (segments, index of the terminating marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    cur = segs[0]
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        nxt = data[pos + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: new segment, markers are modulo-8
            cur = bytearray()
            segs.append(cur)
            pos += 2
        else:  # EOI or next-scan marker
            return [bytes(s) for s in segs], pos
    return [bytes(s) for s in segs], n


def jpeg_pixels(content: bytes) -> np.ndarray:
    """Decode one baseline-sequential JPEG to an (H, W, C) uint8 array
    (C = 1 grayscale, 3 RGB). See module docstring for the supported /
    NotImplementedError / ValueError boundary."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them instead of reading one as the code
        while pos + 1 < n and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, stray RSTn): no length field
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + length]
        if len(seg) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt = np.frombuffer(seg, np.uint8, 64, offset=i).astype(
                        np.int32
                    )
                    i += 64
                elif pq == 1:
                    qt = np.frombuffer(
                        seg[i : i + 128], ">u2"
                    ).astype(np.int32)
                    i += 128
                else:
                    raise ValueError("bad DQT precision")
                qts[tq] = qt
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            if h == 0 or w == 0:
                raise ValueError("JPEG frame with zero dimension")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 1 + 5 + ci * 3)
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq,
                })
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG not supported"
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} coding not supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = seg[i + 1 : i + 17]
                total = sum(counts)
                vals = seg[i + 17 : i + 17 + total]
                if len(vals) != total:
                    raise ValueError("truncated DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huff(
                    counts, vals
                )
                i += 17 + total
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — baseline: single scan, decode now
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cs, tt = struct.unpack_from(">BB", seg, 1 + si * 2)
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                comp["dc"] = tt >> 4
                comp["ac"] = tt & 15
                scomps.append(comp)
            if len(scomps) != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) JPEG not supported"
                )
            segs, _end = _split_scan(content, pos + 2 + length)
            return _decode_scan(frame, scomps, qts, dc_tabs, ac_tabs,
                                restart, segs)
        elif marker == 0xD9:
            break
        # APPn / COM / anything else: skip
        pos += 2 + length
    raise ValueError("JPEG ended without a scan")


def _decode_scan(frame, comps, qts, dc_tabs, ac_tabs, restart, segs):
    w, h = frame["w"], frame["h"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the MCU
        # is one data unit and the declared sampling factors play no role
        # (some encoders still write 2x2 on grayscale; honoring it would
        # mis-lay the blocks on a 4x grid).
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qts:
            raise ValueError("JPEG component references missing DQT")
        if c["dc"] not in dc_tabs or c["ac"] not in ac_tabs:
            raise ValueError("JPEG component references missing DHT")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    preds = [0] * len(comps)
    seg_i = 0
    bits = _Bits(segs[0])
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                bits = _Bits(segs[seg_i])
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, preds[ci] = _decode_block(
                            bits, dc_tabs[c["dc"]], ac_tabs[c["ac"]],
                            qt, preds[ci],
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            n_mcu += 1
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full MCU grid, then crop to frame dims
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0] + 0.5, 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (T.81 Annex K example tables — what libjpeg ships as defaults)
# ---------------------------------------------------------------------------

_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (BITS, HUFFVAL) for the four Annex K example tables
_HT_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_HT_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_HT_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_HT_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # keep only the live bits (same quadratic-growth hazard as _Bits)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            # pad with 1-bits per spec
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _enc_table(bits_counts: bytes, values: bytes) -> dict:
    """symbol -> (code, length) from the same canonical assignment."""
    dec = _build_huff(bits_counts, values)
    return {sym: (code, ln) for (ln, code), sym in dec.items()}


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jpeg_quality_scaling)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """(size, code-bits) for a coefficient value (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_plane_block(bw, blk, qt_nat, dc_tab, ac_tab, pred):
    coef = _T @ (blk - 128.0) @ _T.T
    q = np.round(coef / qt_nat.reshape(8, 8)).astype(np.int32)
    zz = q.flatten()[_ZZ]
    s, bits_val = _mag(int(zz[0]) - pred)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(bits_val, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits_val = _mag(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits_val, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_baseline(
    px, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W) / (H, W, 1) grayscale uint8 array
    as baseline sequential JPEG. ``subsample=True`` uses 4:2:0 chroma
    (the common web layout); otherwise 4:4:4. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (what
    camera/libjpeg output commonly does). Test/fixture-grade encoder:
    fixed Annex K tables, no optimization passes."""
    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode empty image")
    gray = nc == 1
    if not gray and nc != 3:
        raise ValueError("need 1 or 3 channels")
    # The Annex K tables above are printed in NATURAL (row-major) order;
    # T.81 B.2.4.1 stores DQT entries in ZIGZAG order, so emit q[_ZZ]
    # while quantizing with the natural matrix. (Writing the natural
    # order into DQT would silently scramble the effective quantizers —
    # internally consistent with this decoder, but not the table the
    # docstring promises.)
    qy_nat = _scale_q(_STD_LUMA_Q, quality)
    qc_nat = _scale_q(_STD_CHROMA_Q, quality)
    qy = qy_nat[_ZZ]
    qc = qc_nat[_ZZ]
    if gray:
        y_pl, cb_pl, cr_pl = px[:, :, 0], None, None
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y_pl = 0.299 * r + 0.587 * g + 0.114 * b
        cb_pl = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr_pl = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def pad_to(p, mh, mw):
        ph = -(-p.shape[0] // mh) * mh
        pw = -(-p.shape[1] // mw) * mw
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    hs, vs = (2, 2) if (subsample and not gray) else (1, 1)
    y_pad = pad_to(y_pl, 8 * vs, 8 * hs)
    if not gray:
        if subsample:
            cb_s = pad_to(cb_pl, 2, 2)
            cr_s = pad_to(cr_pl, 2, 2)
            cb_s = cb_s.reshape(cb_s.shape[0] // 2, 2,
                                cb_s.shape[1] // 2, 2).mean(axis=(1, 3))
            cr_s = cr_s.reshape(cr_s.shape[0] // 2, 2,
                                cr_s.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            cb_s, cr_s = cb_pl, cr_pl
        cb_pad = pad_to(cb_s, 8, 8)
        cr_pad = pad_to(cr_s, 8, 8)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(qy.astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (hs << 4) | vs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    seg(0xC0, sof)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    for tc_th, (cnts, vals) in (
        ((0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)) if gray else
        ((0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA),
         (0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA))
    ):
        seg(0xC4, bytes([tc_th]) + cnts + vals)
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_y = _enc_table(*_HT_DC_LUMA)
    ac_y = _enc_table(*_HT_AC_LUMA)
    dc_c = _enc_table(*_HT_DC_CHROMA)
    ac_c = _enc_table(*_HT_AC_CHROMA)
    bw = _BitWriter()
    mcux = y_pad.shape[1] // (8 * hs)
    mcuy = y_pad.shape[0] // (8 * vs)
    py = pc_b = pc_r = 0
    n_mcu = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                out.extend(bytes([0xFF, 0xD0 + (n_rst % 8)]))
                n_rst += 1
                bw = _BitWriter()
                py = pc_b = pc_r = 0
            n_mcu += 1
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    py = _encode_plane_block(
                        bw, y_pad[y0:y0 + 8, x0:x0 + 8], qy_nat,
                        dc_y, ac_y, py,
                    )
            if not gray:
                pc_b = _encode_plane_block(
                    bw, cb_pad[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                    qc_nat, dc_c, ac_c, pc_b,
                )
                pc_r = _encode_plane_block(
                    bw, cr_pad[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                    qc_nat, dc_c, ac_c, pc_r,
                )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
