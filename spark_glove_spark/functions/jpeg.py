"""Baseline JPEG codec — pure numpy + stdlib, from the public spec
(ITU-T T.81 / ISO 10918-1: baseline sequential DCT, Huffman coding,
JFIF container). No codec library exists in this container, so both
sides are implemented from the spec: the ENCODER exists to synthesize
deterministic test vectors; the DECODER is the production surface
(`decode_media` routes 0xFFD8 payloads here).

Scope (honest): baseline sequential, 8-bit, grayscale (1 component)
or YCbCr 4:4:4 (3 components, no chroma subsampling), standard
Annex-K Huffman tables, one scan, no restart markers, no progressive
mode. Payloads outside this scope raise NotImplementedError — the
module refuses rather than guesses, same policy as the other
decoders.

Verification strategy (tests/test_jpeg.py + mm_jpeg_decode):
  * stage unit tests — zigzag order against the spec's table, DCT
    orthogonality (IDCT(DCT(x)) == x to 1e-10), Huffman codebook
    construction against hand-derived codes, bit-stuffing roundtrip;
  * flat 8x8 blocks are EXACT through the full pipeline (a constant
    block has only a DC coefficient; with the all-ones quant table
    nothing is lost), which makes a closed-form SQL oracle possible;
  * random images roundtrip within the DCT rounding envelope.
"""

from __future__ import annotations

import numpy as np

# --- spec tables -----------------------------------------------------

# Zigzag index order (T.81 Figure A.6): position i of the 64-length
# scan holds the (row, col) flattened index it reads from.
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

# Annex K.3 typical Huffman tables: (bits[1..16], huffval) per class.
# DC tables code the category (bit length) of the DC difference; AC
# tables code (run << 4) | size with 0x00 = EOB and 0xF0 = ZRL.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
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

# Near-lossless quantization table (all ones): keeps flat blocks
# bit-exact and random blocks inside the DCT rounding envelope. The
# container still carries the table, so a decoder reading a
# standard-table file works identically — nothing is hardcoded.
Q_ONES = np.ones(64, dtype=np.int64)

# 2D DCT-II orthonormal basis (T.81 A.3.3): M[u, x] = c(u) cos((2x+1)uπ/16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def dct2(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT (orthonormal)."""
    return _DCT_M @ block @ _DCT_M.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (orthonormal)."""
    return _DCT_M.T @ coef @ _DCT_M


# --- Huffman ----------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code generation: value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the decoder."""
    return {
        (length, code): v
        for v, (code, length) in _build_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad final byte
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise NotImplementedError("jpeg: truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            else:
                raise NotImplementedError(
                    "jpeg: marker inside scan (restart markers unsupported)"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise NotImplementedError("jpeg: invalid Huffman code")


def _category(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(v).bit_length() if v else 0


def _encode_magnitude(v: int, size: int) -> int:
    """T.81 F.1.2.1: negative values are stored one's-complemented."""
    return v if v >= 0 else v + (1 << size) - 1


def _decode_magnitude(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- encoder ----------------------------------------------------------


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes,
    ac_codes,
) -> int:
    coef = dct2(block.astype(np.float64) - 128.0)
    zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(_encode_magnitude(diff, size), size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        if size > 10:
            # Annex K AC tables stop at magnitude category 10. For
            # 8-bit input the worst-case quantized (Q=1) AC magnitude
            # is ~1020 (the DCT basis-gain bound, category 10 — pinned
            # in tests/test_jpeg.py), so this is unreachable on valid
            # data; guard anyway so an internal error surfaces as a
            # refusal, not a KeyError (ADVICE r4).
            raise NotImplementedError(
                f"jpeg: AC magnitude category {size} > 10 not encodable "
                "with the Annex K tables"
            )
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_encode_magnitude(v, size), size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(img: np.ndarray, q: np.ndarray = Q_ONES) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 image as a
    baseline JFIF JPEG (4:4:4, one scan). H and W must be multiples
    of 8 (the synthesis controls its inputs; general padding is the
    container's job, not the codec demo's)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise NotImplementedError("jpeg: dimensions must be multiples of 8")
    ncomp = 1 if gray else 3
    planes = (
        [img.astype(np.float64)]
        if gray
        else [c for c in np.moveaxis(_rgb_to_ycbcr(img), -1, 0)]
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qzz = np.asarray(q, dtype=np.int64)
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in qzz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out += _seg(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (0, 1, _DC_CHR_BITS, _DC_CHR_VALS),
        (1, 1, _AC_CHR_BITS, _AC_CHR_VALS),
    )[: 2 * (2 if ncomp == 3 else 1)]:
        out += _seg(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    sos = bytes([ncomp])
    for c in range(ncomp):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_lum = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _build_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _build_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(h // 8):
        for bx in range(w // 8):
            for c in range(ncomp):
                blk = planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dcc, acc_ = (dc_lum, ac_lum) if c == 0 else (dc_chr, ac_chr)
                preds[c] = _encode_block(bw, blk, qzz, preds[c], dcc, acc_)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG (grayscale or 4:4:4 YCbCr, one
    scan, no restarts). Returns (H, W) or (H, W, 3) uint8. Raises
    NotImplementedError for features outside the baseline subset."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = ncomp = 0
    comp_q: list[int] = []
    comp_h: list[tuple[int, int]] = []
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("jpeg: marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if payload[0] != 8:
                raise NotImplementedError("jpeg: precision != 8")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            ncomp = payload[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("jpeg: component count")
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError("jpeg: chroma subsampling")
                comp_q.append(tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: non-baseline SOF")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for c in range(ns):
                comp_h.append(
                    (payload[2 + 2 * c] >> 4, payload[2 + 2 * c] & 0xF)
                )
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or not h:
        raise NotImplementedError("jpeg: no scan found")
    if h % 8 or w % 8:
        raise NotImplementedError("jpeg: non-multiple-of-8 dimensions")

    # entropy-coded data runs until the EOI marker
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[scan_start:end])
    planes = [np.zeros((h, w)) for _ in range(ncomp)]
    preds = [0] * ncomp
    inv_zz = np.argsort(ZIGZAG)
    for by in range(h // 8):
        for bx in range(w // 8):
            for c in range(ncomp):
                dc_t = htables[(0, comp_h[c][0])]
                ac_t = htables[(1, comp_h[c][1])]
                q = qtables[comp_q[c]]
                zz = np.zeros(64, dtype=np.int64)
                size = br.read_code(dc_t)
                diff = _decode_magnitude(br.read(size), size) if size else 0
                preds[c] += diff
                zz[0] = preds[c]
                k = 1
                while k < 64:
                    rs = br.read_code(ac_t)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    size = rs & 0xF
                    if k > 63:
                        raise NotImplementedError("jpeg: AC index overflow")
                    zz[k] = _decode_magnitude(br.read(size), size)
                    k += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = (zz * q).astype(np.float64)
                blk = idct2(coef.reshape(8, 8)) + 128.0
                planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    if ncomp == 1:
        out = planes[0]
    else:
        out = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
