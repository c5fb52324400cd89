"""Pure-stdlib baseline JPEG codec (struct + numpy): the real DCT-path
image decode the container's missing PIL/libjpeg would otherwise
provide.

Scope: baseline sequential DCT, 8-bit, single-component (greyscale),
dimensions padded to 8x8 blocks internally and cropped on decode.
Huffman tables are written as real DHT segments and the decoder builds
its tables FROM the stream (canonical code assignment per the JPEG
spec's BITS/HUFFVAL algorithm), so any valid baseline greyscale JPEG
with interleaved non-subsampled data decodes, not just our own output:
the marker walker skips 0xFF fill bytes and zero-payload markers
(TEM, stray RSTn), and DRI restart intervals are honored — the entropy
decoder byte-aligns at each interval, checks the RSTn sequence number,
and resets DPCM state (spec F.2.1.3.1). The encoder can emit them too
(``restart_interval=``), so the restart path is round-trip tested
against streams this module did not hand itself. Color (3-component
YCbCr) and progressive mode are out of scope — PNG
(`functions/png.py`) already covers the RGB path losslessly, and this
module's purpose is the lossy DCT/Huffman/marker machinery.

Determinism contract (what the DuckDB oracle mirrors): quantization
rounds half away from zero; the default table's DC step is 24, so for
an 8x8 CONSTANT block with value v the encoder's only nonzero
coefficient is DC = 8*(v-128) and the decoded block is exactly
clamp(3*round((v-128)/3) + 128). (v-128)/3 is never a half-integer, so
float DCT noise of ~1e-12 around the exact rational can never flip the
rounding — that makes block-constant fixtures bit-exactly predictable
in pure integer SQL while still exercising the full marker/Huffman/
zigzag/DPCM/IDCT pipeline. See `registry.o_media_jpeg_stats`.

Reference parity note: the reference engine (pythonvectordb.py) has no
media surface at all — this is driver-mandate extension surface
(multimodal columns), built to the same oracle-checked standard as the
relational operators.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex-K-shaped standard Huffman specs (BITS: #codes per length 1..16).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# DC step 24 (see module docstring); flat AC step 16 keeps the noise-
# fixture error bounded while still zeroing the float-noise AC of
# constant blocks.
DEFAULT_QTABLE = np.full((8, 8), 16, dtype=np.int32)
DEFAULT_QTABLE[0, 0] = 24


def _zigzag_order() -> np.ndarray:
    """(row, col) visit order of the standard JPEG zigzag, as 64 flat
    indices into a row-major 8x8 block."""
    out = []
    for s in range(15):
        diag = [(u, s - u) for u in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk bottom-left -> top-right
        out.extend(r * 8 + c for r, c in diag)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()

_x = np.arange(8)
_C = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_C[0, :] *= 1.0 / np.sqrt(2.0)  # orthonormal DCT-II basis


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int32)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (JPEG spec figure C.1-C.3):
    value -> (code, bit-length)."""
    sizes = [ln for ln in range(1, 17) for _ in range(bits[ln - 1])]
    codes, code, si = {}, 0, sizes[0] if sizes else 0
    for v, s in zip(vals, sizes):
        while si < s:
            code <<= 1
            si += 1
        codes[v] = (code, s)
        code += 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec F.1.2.3; a padded
        0xFF still gets byte-stuffed by write(), which decoders must and
        do accept before a marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (raw marker bytes — marker 0xFF is
        never stuffed)."""
        self.align()
        self.buf += bytes([0xFF, 0xD0 + (n % 8)])

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # stuffed zero must follow inside entropy data
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return out

    def sync_restart(self) -> int:
        """Consume a restart marker: discard partial bits (the encoder
        byte-aligned before emitting it), skip 0xFF fill bytes, expect
        0xFFD0-0xFFD7, return its sequence number 0-7."""
        self.acc = 0
        self.nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1  # fill bytes before a marker
        if (
            p + 1 >= len(self.data)
            or self.data[p] != 0xFF
            or not (0xD0 <= self.data[p + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos = p + 2
        return self.data[p + 1] - 0xD0


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read(1)
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode(
    arr: np.ndarray,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) greyscale -> baseline JPEG bytes.

    ``restart_interval`` > 0 writes a DRI segment and emits RSTn every
    that many MCUs (byte-aligned, DPCM reset, sequence number cycling
    0-7 per spec F.1.2.3) — the restart path exists so the decoder's
    RSTn handling is exercised by round-trip tests, and so encoded
    output is segment-recoverable the way large-scale JPEGs are."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("expected (H, W) greyscale uint8")
    h, w = a.shape
    q = np.asarray(qtable if qtable is not None else DEFAULT_QTABLE, dtype=np.int32)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    q_zz = q.reshape(64)[ZIGZAG].astype(np.float64)

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    writer = _BitWriter()
    prev_dc = 0
    mcu = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart(mcu // restart_interval - 1)
                prev_dc = 0
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _C @ block @ _C.T
            qz = _round_half_away(coef.reshape(64)[ZIGZAG] / q_zz)
            diff = int(qz[0]) - prev_dc
            prev_dc = int(qz[0])
            cat = _category(diff)
            code, ln = dc_codes[cat]
            writer.write(code, ln)
            if cat:
                writer.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and qz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    code, ln = ac_codes[0x00]  # EOB
                    writer.write(code, ln)
                    break
                while run >= 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                v = int(qz[k])
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                writer.write(code, ln)
                writer.write(v if v > 0 else v + (1 << cat) - 1, cat)
                k += 1

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes())
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + writer.done() + b"\xff\xd9"


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline greyscale JPEG bytes -> uint8 (H, W). Tables are read
    from the stream (DQT/DHT), not assumed."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comp_q = 0
    entropy = b""
    dc_id = ac_id = 0
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        # any number of 0xFF fill bytes may pad before a marker (B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = (data[pos] << 8) | data[pos + 1]
        if marker == 0xFFD9:
            break
        if 0xFFD0 <= marker <= 0xFFD7 or marker == 0xFF01:
            pos += 2  # RSTn / TEM are length-less (B.1.1.3)
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFDB:
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload[off + 1 : off + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                off += 65
        elif marker == 0xFFC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                n = sum(bits)
                vals = list(payload[off + 17 : off + 17 + n])
                codes = _build_codes(bits, vals)
                hufftabs[(tc, th)] = {(ln, code): v for v, (code, ln) in codes.items()}
                off += 17 + n
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            if payload[7] != 0x11:
                raise ValueError("subsampled component unsupported")
            comp_q = payload[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xFFDA:
            dc_id, ac_id = payload[2] >> 4, payload[2] & 0xF
            # entropy data runs to the next real marker (EOI for us)
            end = len(data) - 2
            entropy = data[pos:end]
            pos = end
    if not h or not w or comp_q not in qtables:
        raise ValueError("missing SOF/DQT")
    q_tab = qtables[comp_q].astype(np.float64)
    dc_tab = hufftabs[(0, dc_id)]
    ac_tab = hufftabs[(1, ac_id)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.zeros((ph, pw), dtype=np.uint8)
    reader = _BitReader(entropy)
    prev_dc = 0
    mcu = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                n = reader.sync_restart()
                if n != (mcu // restart_interval - 1) % 8:
                    raise ValueError("restart marker out of sequence")
                prev_dc = 0
            mcu += 1
            zz = np.zeros(64, dtype=np.float64)
            cat = _huff_decode(reader, dc_tab)
            diff = 0
            if cat:
                v = reader.read(cat)
                diff = v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, cat = sym >> 4, sym & 0xF
                k += run
                if k >= 64:
                    raise ValueError("AC index overflow")
                v = reader.read(cat)
                zz[k] = v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz
            block = _C.T @ (coef.reshape(8, 8) * q_tab) @ _C + 128.0
            out[by : by + 8, bx : bx + 8] = np.clip(
                np.sign(block) * np.floor(np.abs(block) + 0.5), 0, 255
            ).astype(np.uint8)
    return out[:h, :w]
