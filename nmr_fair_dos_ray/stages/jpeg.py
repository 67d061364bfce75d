"""Pure-Python/numpy baseline JPEG codec (no codec libraries).

Closes the compressed-image seam of the multimodal stage family
(stages/multimodal.py): `decode_jpeg` handles baseline sequential DCT
JFIF/JPEG (SOF0) — arbitrary embedded quantization and Huffman tables,
grayscale or 3-component YCbCr at sampling factors up to 2×2 (4:4:4, 4:2:2,
4:2:0), restart markers — and `encode_jpeg` produces valid baseline files
for round-trip tests and deterministic fixtures.

Implementation notes:
  * The encoder emits its OWN canonical Huffman tables in the DHT segments
    (fixed 5-bit DC / 9-bit AC code lengths) — any prefix-free table is
    valid JPEG, and the decoder always reads tables from the file, so the
    pair is self-consistent AND the decoder still handles files produced
    with the standard Annex K tables.
  * DCT/IDCT are exact float64 orthonormal matrix products
    (``D @ block @ D.T``); quantization is round-half-away like libjpeg's
    ``descale``. The entropy coder is bit-accurate per ITU T.81 §F: DC
    differences and AC (run, size) symbols with ZRL/EOB, 0xFF byte
    stuffing, byte-aligned RSTn handling.
  * Per-block Python loops are inherent to entropy-coded variable-length
    data and acceptable here: the kernel runs INSIDE an actor-pool
    ``map_batches`` stage (stages/multimodal.py), so rows decode in
    parallel across the pool — same stance as the PNG/PPM/BMP kernels.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x[:, None]
    d = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    d[0] *= 1 / np.sqrt(2)
    return d


_D = _dct_matrix()

#: flat quantization tables (valid JPEG; flat keeps round-trip error bounds
#: simple and deterministic for tests)
_Q_LUMA = np.full(64, 16, np.int64)
_Q_CHROMA = np.full(64, 32, np.int64)


# --------------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops AT markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: per T.81 the decoder pads with 1-bits at segment end
                self.acc = (self.acc << 8) | 0xFF
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

    def align_to_marker(self) -> int:
        """Discard partial byte, expect a marker (e.g. RSTn); return it."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
            self.pos += 1
        marker = d[self.pos + 1]
        self.pos += 2
        return marker


# ---------------------------------------------------------------- huffman
def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) → {symbol: (code, length)} (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} for bit-serial decoding."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, values).items()
    }


def _fixed_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """All ``symbols`` at one code ``length`` (canonical, prefix-free —
    valid as long as len(symbols) < 2**length, which also keeps the
    all-ones code unused as T.81's table-building procedure does)."""
    assert len(symbols) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_DC_BITS, _ENC_DC_VALS = _fixed_table(_DC_SYMS, 5)
_ENC_AC_BITS, _ENC_AC_VALS = _fixed_table(_AC_SYMS, 9)
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_value(w: _BitWriter, v: int, table: dict) -> None:
    """Huffman symbol for the category + the value bits (T.81 §F.1.2.1)."""
    cat = _category(v)
    code, ln = table[cat]
    w.write(code, ln)
    if cat:
        if v < 0:
            v += (1 << cat) - 1
        w.write(v, cat)


# ---------------------------------------------------------------- encoder
def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """H×W plane (multiple of 8) → (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(img: np.ndarray) -> bytes:
    """uint8 image (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB → baseline
    JFIF bytes (4:4:4, flat quant tables, own canonical Huffman tables)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects uint8 (H, W[, 1|3])")
    h, w, nc = img.shape
    planes = (
        [img[:, :, 0].astype(np.float64)] if nc == 1
        else list(np.moveaxis(_rgb_to_ycbcr(img.astype(np.float64)), -1, 0))
    )
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qts = [_Q_LUMA] + ([_Q_CHROMA] if nc == 3 else [])

    # per-component quantized coefficient blocks (raster MCU order = block
    # order at 4:4:4)
    comp_coef = []
    for ci, plane in enumerate(planes):
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[h - 1 : h, :]
        padded[:, w:] = padded[:, w - 1 : w]
        blocks = _blocks_of(padded - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", _D, blocks, _D)
        q = qts[min(ci, 1)].reshape(8, 8).astype(np.float64)
        quant = np.floor(coef / q + 0.5).astype(np.int64)  # round half up
        comp_coef.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    w_bits = _BitWriter()
    prev_dc = [0] * nc
    for b in range(comp_coef[0].shape[0]):
        for ci in range(nc):
            zz = comp_coef[ci][b]
            _encode_value(w_bits, int(zz[0]) - prev_dc[ci], _ENC_DC)
            prev_dc[ci] = int(zz[0])
            run = 0
            nz = np.flatnonzero(zz[1:]) + 1
            last = int(nz[-1]) if nz.size else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = _ENC_AC[0xF0]
                    w_bits.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = _ENC_AC[(run << 4) | cat]
                w_bits.write(code, ln)
                if v < 0:
                    v += (1 << cat) - 1
                w_bits.write(v, cat)
                run = 0
            if last < 63:
                code, ln = _ENC_AC[0x00]
                w_bits.write(code, ln)
    w_bits.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, qt in enumerate(qts):
        out += seg(0xDB, bytes([qi]) + bytes(int(x) for x in qt))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])  # 4:4:4, quant table id
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    if nc == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    sos = bytes([nc])
    for ci in range(nc):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += w_bits.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
def _read_huff_value(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0) → uint8 (H, W, C) with C ∈ {1, 3}
    (RGB for 3-component YCbCr). Raises ValueError for progressive /
    arithmetic / >8-bit / truncated files (so the decode stage dead-letters
    instead of failing its map_batches task — the M17 pattern)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error, KeyError, StopIteration,
            OverflowError) as e:
        # KeyError: scan references an undefined quant/Huffman table;
        # OverflowError: corrupt DC deltas accumulating past int64;
        # the others: truncated/corrupt byte streams
        raise ValueError(f"truncated/corrupt JPEG: {e!r}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected in JPEG header")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq_tq = body[bpos]
                prec, tid = pq_tq >> 4, pq_tq & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tid] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], np.uint8
                ).astype(np.int64)
                bpos += 65
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc_th = body[bpos]
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _decode_table(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:  # scan references a component SOF lacks
                    raise ValueError(f"SOS component id {cs} not in frame")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(payload, pos, frame, scan, qt, huff,
                                restart_interval)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if len(scan) == 1:
        hmax = vmax = scan[0][0]["h"] = scan[0][0]["v"] = 1
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c, _, _ in scan:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    r = _BitReader(data, pos)
    prev_dc = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                marker = r.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError("expected RSTn marker")
                prev_dc = [0] * len(scan)
            for si, (c, td, ta) in enumerate(scan):
                dq = qt[c["tq"]]
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        cat = _read_huff_value(r, dct)
                        if cat > 16:  # 8-bit baseline DC category <= 11;
                            raise ValueError(  # larger = corrupt table/stream
                                f"DC category {cat} out of range"
                            )
                        diff = _extend(r.read_bits(cat), cat) if cat else 0
                        prev_dc[si] += diff
                        zz[0] = prev_dc[si]
                        k = 1
                        while k < 64:
                            sym = _read_huff_value(r, act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            cat = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.read_bits(cat), cat)
                            k += 1
                        coef = (zz * dq)[_UNZIGZAG].reshape(8, 8).astype(np.float64)
                        blk = _D.T @ coef @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[si][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    # upsample chroma to full frame resolution (nearest) and crop
    out = []
    for si, (c, _, _) in enumerate(scan):
        p = planes[si]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:fh, :fw])
    if len(out) == 1:
        return np.clip(out[0] + 0.5, 0, 255).astype(np.uint8)[:, :, None]
    rgb = _ycbcr_to_rgb(np.stack(out, axis=-1))
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)
