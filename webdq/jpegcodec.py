"""Pure-numpy baseline JPEG codec (no PIL/libjpeg in the container).

Decoder: baseline sequential Huffman JPEG (SOF0/SOF1), grayscale or
YCbCr with arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...),
restart markers, byte stuffing. Chroma upsampling is nearest-neighbor
(pixel replication) — a valid decode; libjpeg's "fancy" interpolated
upsampling differs by ±a few code values on subsampled chroma edges,
which is inside the tolerance of every consumer here (feature
extraction). Progressive (SOF2) and arithmetic coding raise at the
seam.

Encoder (fixture generator + roundtrip oracle): 4:4:4 or grayscale
baseline JPEG. It writes its OWN quantization and Huffman tables into
DQT/DHT — JPEG files carry their tables, so the codec's correctness
never depends on reproducing the Annex K defaults from memory. The
encoder's Huffman tables are minimal valid canonical codes (all DC
symbols at 4 bits, all AC symbols at 9 bits — Kraft-satisfying,
prefix-free); files are larger than libjpeg's but byte-valid.

Public format: ITU-T T.81 / ISO 10918-1 (public standard). All DCT /
quantization / zigzag math is numpy; the entropy loop is plain Python
over a few thousand symbols per small image (fixtures); a production
path would mapInPandas over many images per Arrow batch, which is the
integration multimodal.decode_image_features already has.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan → (row, col) in the 8×8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8×8 DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16); spatial = Aᵀ·coef·A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# ------------------------------------------------------------------ huffman

def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 C.2: {(code_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code_length, code)} — inverse of the decode table."""
    return {sym: (ln, code) for (ln, code), sym in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------------ decoder

class JpegDecodeError(ValueError):
    pass


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicated across channels)."""
    if payload[:2] != b"\xff\xd8":
        raise JpegDecodeError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegDecodeError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:  # 16-bit table (rare, legal in extended)
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            precision, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if precision != 8:
                raise JpegDecodeError(f"{precision}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) — baseline decoder seam")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type 0x{marker:02x} unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "td": tds >> 4, "ta": tds & 0x0F})
            pos += seg_len
            return _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval)
        # APPn / COM / others: skip
        pos += seg_len
    raise JpegDecodeError("no SOS found")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    if frame is None:
        raise JpegDecodeError("SOS before SOF")
    # split entropy data into restart chunks, un-stuffing 0xFF00
    chunks: list[bytearray] = [bytearray()]
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            chunks[-1].append(b)
            pos += 1
            continue
        m = payload[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            chunks[-1].append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            chunks.append(bytearray())
            pos += 2
        else:  # EOI or next marker
            break

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["td"], c["ta"] = s["td"], s["ta"]
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }

    order = [by_id[s["id"]] for s in scan]
    mcu_index = 0
    chunk_idx = 0
    reader = _BitReader(bytes(chunks[0]))
    pred = {c["id"]: 0 for c in comps}
    total_mcus = mcus_x * mcus_y
    while mcu_index < total_mcus:
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            chunk_idx += 1
            reader = _BitReader(bytes(chunks[chunk_idx]))
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu_index, mcus_x)
        for c in order:
            q = qt[c["tq"]]
            dct = huff_dc[c["td"]]
            act = huff_ac[c["ta"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.decode_symbol(dct)
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, ssss = rs >> 4, rs & 0x0F
                        if ssss == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegDecodeError("AC index overflow")
                        zz[k] = _extend(reader.read_bits(ssss), ssss)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * q
                    spatial = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * c["v"] + v) * 8
                    x0 = (mx * c["h"] + hh) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
        mcu_index += 1

    # upsample (pixel replication) and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the color path: truncation would bias IDCT float
        # error (e.g. 99.9999) low by one code value (ADVICE r3)
        g = np.clip(full[0], 0, 255).round()
        return np.dstack([g, g, g]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)


# ------------------------------------------------------------------ encoder

# minimal VALID canonical tables (carried in DHT — no Annex K needed):
# DC: the 12 category symbols at 4 bits (12·2⁻⁴ ≤ 1);
# AC: 255 run/size symbols at 9 bits + the last at 10 (DHT's
# per-length count is one byte, so 256-at-one-length is unencodable;
# Kraft: 255·2⁻⁹ + 2⁻¹⁰ < 1, and no code is all-ones).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_VALS = list(range(256))

_QUANT = np.array(
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
    dtype=np.int32,
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _quality_table(quality: int) -> np.ndarray:
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QUANT * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode an (h, w, 3) uint8 RGB (or (h, w) grayscale) array as a
    baseline 4:4:4 JPEG. Tables are written into the stream; the
    decoder reads them back — nothing is implicit."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = _quality_table(quality)
    qzig = q[ZIGZAG]  # table stored in zigzag order

    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    dc_enc = _build_encode_table(_DC_BITS, _DC_VALS)
    ac_enc = _build_encode_table(_AC_BITS, _AC_VALS)

    bw = _BitWriter()
    pred = [0] * len(planes)
    bh, bwd = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, bh * 8 - h), (0, bwd * 8 - w)), mode="edge")
        padded.append(pp)
    for by in range(bh):
        for bx in range(bwd):
            for ci, p in enumerate(padded):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _fdct2(block)
                zz = np.round(coef.reshape(-1)[ZIGZAG] / qzig).astype(np.int64)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                ln, code = dc_enc[t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                last = (last_nz[-1] + 1) if len(last_nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_enc[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    ssss = _category(v)
                    ln, code = ac_enc[(run << 4) | ssss]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << ssss) - 1, ssss)
                    run = 0
                if last < 63:
                    ln, code = ac_enc[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qzig.astype(np.uint8)))
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])  # 1×1 sampling, quant table 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
