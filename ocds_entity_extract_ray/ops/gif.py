"""GIF (GIF87a/89a, LZW) encode/decode in pure numpy/stdlib — the
cheapest remaining real-crawl image format after JPEG (VERDICT r04 #6),
wired into the same ``decode='real'`` seam (ops/codecs.decode_image) the
JPEG kernel uses, so featurize/phash/resize stages accept GIF payloads
unchanged.

Scope (documented contract):
  - DECODE: the FIRST image of any GIF87a/GIF89a stream — global and
    local color tables, interlaced and sequential row order, extension
    blocks skipped (graphic control / comment / application), full
    variable-width LZW (code growth to 12 bits, CLEAR resets, deferred
    clear: a full dictionary simply stops growing until the encoder sends
    CLEAR). Animated GIFs decode to their first frame; transparency is
    ignored (the transparent index renders as its palette color).
  - ENCODE: single-frame, <= 256 unique colors (raises above — this
    encoder exists to synthesize deterministic test/benchmark payloads,
    not to quantize photos), optional interlaced row order, real
    dictionary LZW (fresh-entry compression, not the uncompressed-GIF
    trick), CLEAR emitted when the table fills.

LZW width discipline (the classic GIF trap): the decoder grows its code
width AFTER adding a dictionary entry, when ``next_code == 1 << width``
(no "early change" — that is TIFF's variant). The encoder therefore
cannot derive the width of an emitted code from its OWN table counter
(which runs one entry AHEAD of the decoder's between the first data code
and the final flush): it SIMULATES the decoder's counter — one add per
emitted code starting from the second since CLEAR — and widens exactly
when the simulated decoder does.  tests/test_ops.py pins this with a
hand-built wire fixture (bit packing derived in comments) so a
symmetrically-wrong encoder/decoder pair cannot round-trip its way past
the suite.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_CODE = 4096  # 12-bit LZW ceiling (GIF appendix F)

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step)


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order."""
    return np.concatenate(
        [np.arange(first, h, step) for first, step in _INTERLACE_PASSES]
    ).astype(np.int64)


class _BitReader:
    """LSB-first variable-width code reader over the concatenated
    image-data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > 8 * len(self.data):
            raise ValueError("gif: LZW stream exhausted mid-code")
        out = 0
        got = 0
        while got < width:
            byte = self.data[(self.pos + got) >> 3]
            bit_off = (self.pos + got) & 7
            take = min(8 - bit_off, width - got)
            out |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.cur & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.bytes)


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """Variable-width GIF-LZW -> palette indices (uint8), exactly
    ``n_pixels`` of them (trailing codes beyond the raster are ignored,
    like every tolerant decoder)."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"gif: LZW min code size {mcs} out of range")
    clear = 1 << mcs
    eoi = clear + 1
    r = _BitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # dictionary as flat arrays: prefix link + final byte per code
    prefix = np.full(MAX_CODE, -1, dtype=np.int32)
    suffix = np.zeros(MAX_CODE, dtype=np.uint8)
    for c in range(clear):
        suffix[c] = c
    buf = np.empty(MAX_CODE, dtype=np.uint8)  # expansion scratch (max chain)

    def expand(code: int) -> np.ndarray:
        n = 0
        c = code
        while c >= 0:
            buf[n] = suffix[c]
            c = prefix[c] if c >= clear else -1
            n += 1
        return buf[:n][::-1]

    width = mcs + 1
    next_code = eoi + 1
    prev = -1
    while n_out < n_pixels:
        code = r.read(width)
        if code == clear:
            width = mcs + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            # `out` is np.empty: an early EOI must NOT leak uninitialized
            # heap bytes into pixels (review finding — two decodes of the
            # same truncated stream returned different rasters)
            if n_out < n_pixels:
                raise ValueError(
                    f"gif: LZW stream ended after {n_out}/{n_pixels} pixels"
                )
            break
        if prev < 0:  # first data code after clear: must be a root
            if code >= clear:
                raise ValueError("gif: first LZW code after CLEAR not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            entry = expand(code)
        elif code == next_code:  # the KwKwK case
            p = expand(prev)
            entry = np.concatenate([p, p[:1]])
        else:
            raise ValueError("gif: LZW code beyond dictionary")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if next_code < MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = entry[0]
            next_code += 1
            # no early change: widen AFTER the add fills the current width
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError(f"gif: LZW stream ended after {n_out}/{n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Palette indices -> GIF-LZW bytes (no sub-block framing). Emits
    CLEAR first (what every mainstream encoder does) and again whenever
    the table fills; code widths follow the SIMULATED DECODER counter —
    see the module docstring for why the encoder's own counter is wrong."""
    clear = 1 << mcs
    eoi = clear + 1
    w = _BitWriter()

    table: dict[tuple, int] = {}
    enc_next = eoi + 1
    width = mcs + 1
    dec_next = eoi + 1  # the decoder's add counter, simulated
    emitted = 0  # data codes since the last CLEAR

    def emit(code: int, *, data: bool) -> None:
        nonlocal width, dec_next, emitted
        w.write(code, width)
        if data:
            emitted += 1
            # the decoder adds one entry per data code from the SECOND on
            if emitted >= 2 and dec_next < MAX_CODE:
                dec_next += 1
                if dec_next == (1 << width) and width < 12:
                    width += 1

    def reset() -> None:
        nonlocal table, enc_next, width, dec_next, emitted
        table = {}
        enc_next = eoi + 1
        width = mcs + 1
        dec_next = eoi + 1
        emitted = 0

    emit(clear, data=False)
    reset()
    run: tuple = ()
    for px in indices.tolist():
        cand = run + (px,)
        if len(cand) == 1 or cand in table:
            run = cand
            continue
        emit(table[run] if len(run) > 1 else run[0], data=True)
        if enc_next < MAX_CODE:
            table[cand] = enc_next
            enc_next += 1
        else:
            emit(clear, data=False)
            reset()
        run = (px,)
    if run:
        emit(table[run] if len(run) > 1 else run[0], data=True)
    emit(eoi, data=False)
    return w.flush()


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(rgb: np.ndarray, *, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB -> single-frame GIF89a. Raises ValueError above
    256 unique colors (no quantizer — deterministic payloads only)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"encode_gif: {len(palette)} unique colors > 256 (this encoder "
            "synthesizes test payloads and does not quantize)"
        )
    # color table size must be a power of two >= 2 entries
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, bits)

    idx2d = indices.reshape(h, w).astype(np.uint8)
    if interlace:
        idx2d = idx2d[_interlace_order(h)]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    out += _subblocks(_lzw_encode(idx2d.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the FIRST image. Malformed or
    TRUNCATED payloads raise ValueError (the codec-wide contract callers
    catch to skip bad crawl items), never raw IndexError/struct.error."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"gif: truncated or malformed payload ({e})") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X}")
        il, it, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iw == 0 or ih == 0:
            raise ValueError("gif: zero image dimension")
        from .jpeg import MAX_DECODE_PIXELS

        if iw * ih > MAX_DECODE_PIXELS:
            # untrusted crawl header — same allocation bound as decode_jpeg
            raise ValueError(
                f"gif: frame {ih}x{iw} exceeds MAX_DECODE_PIXELS={MAX_DECODE_PIXELS}"
            )
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: image without any color table")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), mcs, iw * ih)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("gif: pixel index beyond color table")
        img = ct[idx].reshape(ih, iw, 3)
        if ipacked & 0x40:  # interlaced: rows arrived in pass order
            order = _interlace_order(ih)
            out = np.empty_like(img)
            out[order] = img
            img = out
        return img.copy()
    raise ValueError("gif: no image descriptor")
