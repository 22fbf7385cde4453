"""WebP-lossless (VP8L) codec in pure numpy/stdlib — the next real crawl
image format after JPEG/PNG/GIF (`ops/codecs.py` decode seam).

DECODER (``decode_webp``): the full VP8L feature set as shipped by real
encoders — all four transforms (predictor with all 14 modes, color
transform, subtract-green, color-indexing INCLUDING sub-byte pixel
bundling for <=16-color palettes), color cache, LZ77 backward
references, meta prefix-code groups (spatially varying entropy codes),
simple and normal prefix codes with the full RLE code-length coding
(16/17/18 repeats, max_symbol cutoff).

ENCODER (``encode_webp_lossless``): a valid minimal bitstream writer
whose option flags exist to drive every decoder path in tests —
literal-only by default, plus subtract-green, uniform-mode predictor,
color transform, palette (with bundling), LZ77, and color-cache modes.
Byte-deterministic.

DOCUMENTED GATE: LZ77 distance codes 1..120 are "neighbor-mapped"
through a 120-entry (dx, dy) table listed in the spec; reproducing that
table from memory risks silent pixel corruption, so the decoder RAISES
NotImplementedError for mapped codes instead of guessing (same policy
as the arithmetic-JPEG gate in ops/jpeg.py). This encoder always emits
explicit distances (code = distance + 120), so round trips never hit
the gate; real-crawl files using near distances fail loudly, not wrong.

Bit order: LSB-first within bytes (DEFLATE convention); prefix-code
bits are written/read MSB-of-code-first (canonical Huffman, as in
DEFLATE). Citing the public bitstream spec (RFC 9649) sections in the
comments.
"""

from __future__ import annotations

import numpy as np

# --- bit IO (LSB-first) --------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("vp8l: truncated bitstream")
            bit = (self._d[byte] >> (self._pos & 7)) & 1
            out |= bit << i
            self._pos += 1
        return out

    def read_code_bit(self) -> int:
        return self.read(1)


class _BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self._bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        # prefix-code bits go MSB-first
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# --- canonical prefix codes ----------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixDecoder:
    """Canonical-by-length decoder (reads one bit at a time, MSB-first
    code accumulation). Also models 0-bit (single-symbol) codes."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self._single = nz[0][1]
            return
        self._single = None
        max_len = max(ln for ln, _s in nz)
        self._count = [0] * (max_len + 1)
        for ln, _s in nz:
            self._count[ln] += 1
        self._symbols = [s for _l, s in sorted(nz)]
        # first code value and symbol offset at each length
        self._first = [0] * (max_len + 1)
        self._offset = [0] * (max_len + 1)
        code = 0
        offset = 0
        for ln in range(1, max_len + 1):
            self._first[ln] = code
            self._offset[ln] = offset
            code = (code + self._count[ln]) << 1
            offset += self._count[ln]
        self._max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        for ln in range(1, self._max_len + 1):
            code = (code << 1) | br.read_code_bit()
            idx = code - self._first[ln]
            if 0 <= idx < self._count[ln]:
                return self._symbols[self._offset[ln] + idx]
        raise ValueError("vp8l: invalid prefix code")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    """Spec 'prefix code' — simple (1-2 symbols) or normal (code-length
    coded) form."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: bad simple code symbols")
        if num_symbols == 1:
            lengths[sym0] = 1  # single-symbol: decode() reads 0 bits
            d = _PrefixDecoder(lengths)
            return d
        sym1 = br.read(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ValueError("vp8l: bad simple code symbols")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixDecoder(lengths)
    # normal
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    if br.read(1):  # use length / max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_dec.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("vp8l: code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("vp8l: code-length repeat overflow")
    # completeness: an over- or under-subscribed code decodes to aliased
    # or unreachable symbols SILENTLY — reject like real decoders do
    # (a single-symbol code is the legal exception: 0 bits per read)
    nz = [ln for ln in lengths if ln]
    if len(nz) > 1:
        kraft = sum(1 << (15 - ln) for ln in nz)
        if kraft != 1 << 15:
            raise ValueError("vp8l: incomplete or over-subscribed prefix code")
    return _PrefixDecoder(lengths)


# --- LZ77 prefix-coded values --------------------------------------------------


def _read_lz77_value(br: _BitReader, prefix_sym: int) -> int:
    """length/distance prefix coding: symbol -> value (spec §4.2.2)."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra_bits = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """value -> (prefix_sym, extra_bits, extra_val); inverse of above."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra_bits = hi - 1
    prefix = (hi << 1) | ((v >> extra_bits) & 1)
    extra = v & ((1 << extra_bits) - 1)
    # re-derive to be safe
    offset = (2 + (prefix & 1)) << extra_bits
    assert offset + extra + 1 == value
    return prefix, extra_bits, extra


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# --- transforms (inverse, decode side) ------------------------------------------


def _avg2(a, b):
    return ((a.astype(np.uint16) + b.astype(np.uint16)) >> 1).astype(np.uint8)


def _predict(mode: int, L, T, TL, TR):
    """Per-pixel scalar prediction for channels (uint8 arrays len 4)."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], dtype=np.uint8)  # ARGB opaque black
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = np.abs(p - L.astype(np.int32)).sum()
        pt = np.abs(p - T.astype(np.int32)).sum()
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        a = _avg2(L, T).astype(np.int32)
        d = a - TL.astype(np.int32)
        # C division truncates toward zero; Python // floors — they
        # differ for negative odd deltas (spec/libwebp use C semantics)
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255).astype(np.uint8)
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _apply_inverse_predictor(img: np.ndarray, modes: np.ndarray, bs: int) -> None:
    """img (h, w, 4 ARGB) holds residuals; add predictions in place,
    scan order. Edge rules: (0,0) predicts opaque black; row 0 uses L;
    col 0 uses T; TR at x = w-1 is row above wrapped to THIS row's first
    pixel (the flat-index convention real decoders share)."""
    h, w, _ = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.uint8)
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                mode = int(modes[y // bs, x // bs])
                L = img[y, x - 1]
                T = img[y - 1, x]
                TL = img[y - 1, x - 1]
                TR = img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            img[y, x] = (img[y, x].astype(np.uint16) + pred) & 0xFF


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, per pixel."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _apply_inverse_color_transform(
    img: np.ndarray, cts: np.ndarray, bs: int
) -> None:
    """cts (bh, bw, 4 ARGB): per the spec/libwebp element packing
    (ColorTransformElement unpacked from the ARGB word), green_to_red
    lives in the BLUE channel (lowest byte), green_to_blue in GREEN,
    red_to_blue in RED."""
    h, w, _ = img.shape
    by = np.arange(h) // bs
    bx = np.arange(w) // bs
    g2r = cts[by][:, bx, 3]
    g2b = cts[by][:, bx, 2]
    r2b = cts[by][:, bx, 1]
    a, r, g, b = (img[..., i].astype(np.int32) for i in range(4))
    r = (r + _ct_delta(g2r, img[..., 2])) & 0xFF
    b2 = (b + _ct_delta(g2b, img[..., 2]) + _ct_delta(r2b, r.astype(np.uint8))) & 0xFF
    img[..., 1] = r.astype(np.uint8)
    img[..., 3] = b2.astype(np.uint8)


# --- image-stream decode --------------------------------------------------------

_GREEN_EXTRA = 24  # length prefix symbols
_NUM_DIST = 40


def _decode_image_stream(
    br: _BitReader, w: int, h: int, *, is_level0: bool
) -> np.ndarray:
    """Decode one ARGB image stream (spec §5); returns (h, w, 4) uint8
    in ARGB channel order."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green", None, None))
            elif ttype == 0:  # PREDICTOR
                bs = 1 << (br.read(3) + 2)
                bw, bh = (w + bs - 1) // bs, (h + bs - 1) // bs
                sub = _decode_image_stream(br, bw, bh, is_level0=False)
                transforms.append(("predictor", sub[..., 2].copy(), bs))
            elif ttype == 1:  # COLOR_TRANSFORM
                bs = 1 << (br.read(3) + 2)
                bw, bh = (w + bs - 1) // bs, (h + bs - 1) // bs
                sub = _decode_image_stream(br, bw, bh, is_level0=False)
                transforms.append(("color_transform", sub, bs))
            else:  # 3: COLOR_INDEXING
                pal_size = br.read(8) + 1
                pal_img = _decode_image_stream(br, pal_size, 1, is_level0=False)
                # palette entries are component-wise delta-coded
                pal = np.cumsum(pal_img[0].astype(np.uint16), axis=0).astype(
                    np.uint8
                )
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("palette", pal, width_bits))
                w = (w + (1 << width_bits) - 1) >> width_bits

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color-cache size")
    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None

    # meta prefix codes
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_stream(br, mw, mh, is_level0=False)
        meta = (
            meta_img[..., 1].astype(np.int32) << 8
        ) | meta_img[..., 2].astype(np.int32)
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + _GREEN_EXTRA + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _g in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, _NUM_DIST),  # distance
            )
        )

    n = w * h
    pix = np.zeros((n, 4), dtype=np.uint8)  # ARGB
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[gi]
        else:
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[0]
        s = g_dec.decode(br)
        if s < 256:  # literal
            red = r_dec.decode(br)
            blue = b_dec.decode(br)
            alpha = a_dec.decode(br)
            pix[pos] = (alpha, red, s, blue)
            if cache is not None:
                argb = (alpha << 24) | (red << 16) | (s << 8) | blue
                cache[_cache_hash(argb, cache_bits)] = argb
            pos += 1
        elif s < 256 + _GREEN_EXTRA:  # LZ77 backward reference
            length = _read_lz77_value(br, s - 256)
            dist_code = _read_lz77_value(br, d_dec.decode(br))
            if dist_code <= 120:
                raise NotImplementedError(
                    "vp8l: neighbor-mapped LZ77 distance codes (1..120) "
                    "are gated — the spec's 120-entry (dx,dy) table is "
                    "required for correctness; refusing to guess"
                )
            dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: LZ77 reference out of range")
            for i in range(length):  # may self-overlap
                pix[pos + i] = pix[pos + i - dist]
            if cache is not None:
                for i in range(length):
                    a_, r_, g_, b_ = pix[pos + i]
                    argb = (
                        (int(a_) << 24) | (int(r_) << 16) | (int(g_) << 8) | int(b_)
                    )
                    cache[_cache_hash(argb, cache_bits)] = argb
            pos += length
        else:  # color-cache hit
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            argb = int(cache[s - 256 - _GREEN_EXTRA])
            pix[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            pos += 1

    img = pix.reshape(h, w, 4)

    # inverse transforms, reverse order
    for name, data, arg in reversed(transforms):
        if name == "palette":
            pal, width_bits = data, arg
            if width_bits:
                per = 1 << width_bits
                bits = 8 >> width_bits
                idx = img[..., 2]  # packed indices in green
                full_w = None  # original width recovered by caller pad
                cols = []
                for k in range(per):
                    cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
                unpacked = np.stack(cols, axis=2).reshape(h, -1)
                img_idx = unpacked
            else:
                img_idx = img[..., 2].astype(np.int64)
            if (img_idx >= len(pal)).any():
                raise ValueError("vp8l: palette index out of range")
            img = pal[img_idx.astype(np.int64)]
        elif name == "subtract_green":
            g = img[..., 2].astype(np.uint16)
            img[..., 1] = ((img[..., 1] + g) & 0xFF).astype(np.uint8)
            img[..., 3] = ((img[..., 3] + g) & 0xFF).astype(np.uint8)
        elif name == "predictor":
            _apply_inverse_predictor(img, data, arg)
        elif name == "color_transform":
            _apply_inverse_color_transform(img, data, arg)
    return img


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container -> (h, w, 4) uint8 RGBA. VP8L (lossless) only;
    lossy VP8 and extended VP8X stay gated like the other compressed
    codecs."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("vp8l: not a WebP container")
    tag = payload[12:16]
    if tag == b"VP8 " or tag == b"VP8X":
        raise NotImplementedError("vp8l: lossy VP8 / extended WebP gated")
    if tag != b"VP8L":
        raise ValueError(f"vp8l: unknown chunk {tag!r}")
    size = int.from_bytes(payload[16:20], "little")
    data = payload[20 : 20 + size]
    if len(data) < 5 or data[0] != 0x2F:
        raise ValueError("vp8l: bad VP8L signature")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unknown version")
    argb = _decode_image_stream(br, w, h, is_level0=True)
    # crop palette-bundled padding and convert ARGB -> RGBA
    argb = argb[:, :w]
    return np.stack(
        [argb[..., 1], argb[..., 2], argb[..., 3], argb[..., 0]], axis=2
    )


# --- encoder ---------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """True Huffman code lengths (always a COMPLETE code — Kraft sum 1);
    raises if the tree exceeds ``max_len`` (callers feed controlled
    distributions; this writer targets correctness, not ratio)."""
    import heapq
    import itertools

    items = sorted(freqs.items())
    if not items:
        raise ValueError("vp8l encode: empty alphabet")
    if len(items) == 1:
        return {items[0][0]: 1}
    tie = itertools.count()
    heap = [(f, next(tie), {s: 0}) for s, f in items]
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, _ta, a = heapq.heappop(heap)
        fb, _tb, b = heapq.heappop(heap)
        merged = {s: ln + 1 for s, ln in a.items()}
        merged.update({s: ln + 1 for s, ln in b.items()})
        heapq.heappush(heap, (fa + fb, next(tie), merged))
    lengths = heap[0][2]
    if max(lengths.values()) > max_len:
        raise ValueError(
            f"vp8l encode: Huffman depth {max(lengths.values())} > {max_len}"
        )
    return lengths


class _PrefixEncoder:
    def __init__(self, freqs: dict[int, int], alphabet_size: int):
        self.alphabet_size = alphabet_size
        used = sorted(freqs)
        self.simple = (
            len(used) <= 2 and all(s <= 255 for s in used)
        )
        if self.simple:
            self.symbols = used
            self.codes = (
                {used[0]: (0, 0)}
                if len(used) == 1
                else {used[0]: (0, 1), used[1]: (1, 1)}
            )
            return
        ln = _huffman_lengths(freqs, 15)
        lengths = [ln.get(s, 0) for s in range(alphabet_size)]
        self.lengths = lengths
        self.codes = _canonical_codes(lengths)

    def write_def(self, bw: _BitWriter) -> None:
        if self.simple:
            bw.write(1, 1)  # simple
            bw.write(len(self.symbols) - 1, 1)
            s0 = self.symbols[0]
            if s0 <= 1 and len(self.symbols) == 1:
                bw.write(0, 1)  # 1-bit first symbol
                bw.write(s0, 1)
            else:
                bw.write(1, 1)  # 8-bit first symbol
                bw.write(s0, 8)
            if len(self.symbols) == 2:
                bw.write(self.symbols[1], 8)
            return
        bw.write(0, 1)  # normal
        # serialize the length array as CL symbols (17/18 zero-runs)
        cl_syms: list[tuple[int, int, int]] = []  # (cl, extra, extra_bits)
        i = 0
        L = self.lengths
        while i < len(L):
            if L[i] == 0:
                j = i
                while j < len(L) and L[j] == 0:
                    j += 1
                run = j - i
                while run > 0:
                    if run >= 11:
                        r = min(run, 138)
                        cl_syms.append((18, r - 11, 7))
                        run -= r
                    elif run >= 3:
                        cl_syms.append((17, run - 3, 3))
                        run = 0
                    else:
                        for _ in range(run):
                            cl_syms.append((0, 0, 0))
                        run = 0
                i = j
            else:
                cl_syms.append((L[i], 0, 0))
                i += 1
        cl_freq: dict[int, int] = {}
        for c, _e, _b in cl_syms:
            cl_freq[c] = cl_freq.get(c, 0) + 1
        if len(cl_freq) == 1:
            cl_lengths = {next(iter(cl_freq)): 1}
        else:
            cl_lengths = _huffman_lengths(cl_freq, 7)
        cl_len_arr = [0] * 19
        for s, l2 in cl_lengths.items():
            cl_len_arr[s] = l2
        # num_code_lengths: cover the largest _CL_ORDER position used
        max_pos = max(
            i for i, s in enumerate(_CL_ORDER) if cl_len_arr[s]
        )
        num_cl = max(4, max_pos + 1)
        bw.write(num_cl - 4, 4)
        for i in range(num_cl):
            bw.write(cl_len_arr[_CL_ORDER[i]], 3)
        cl_codes = _canonical_codes(cl_len_arr)
        bw.write(0, 1)  # no max_symbol cutoff: full length array follows
        single_cl = len(cl_freq) == 1
        for c, extra, ebits in cl_syms:
            if not single_cl:
                code, ln2 = cl_codes[c]
                bw.write_code(code, ln2)
            # single-symbol CL code: decoder reads 0 bits per symbol
            if ebits:
                bw.write(extra, ebits)

    def write_sym(self, bw: _BitWriter, sym: int) -> None:
        code, ln = self.codes[sym]
        if ln:
            bw.write_code(code, ln)


def _forward_predict(img: np.ndarray, mode: int) -> np.ndarray:
    """Residuals for a UNIFORM predictor mode (mirrors
    _apply_inverse_predictor's edge rules exactly)."""
    h, w, _ = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.uint8)
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                L = img[y, x - 1]
                T = img[y - 1, x]
                TL = img[y - 1, x - 1]
                TR = img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = (img[y, x].astype(np.int16) - pred) & 0xFF
    return out


def _write_image_stream(
    bw: _BitWriter,
    argb: np.ndarray,
    *,
    cache_bits: int = 0,
    use_lz77: bool = False,
    level0: bool = False,
) -> None:
    """Encode one ARGB image as a single-group stream. Level-0 streams
    carry a meta-prefix bit (always 0 here) right after the cache bit;
    sub-images do not."""
    h, w, _ = argb.shape
    flat = argb.reshape(-1, 4)
    n = len(flat)

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if level0:
        bw.write(0, 1)  # no meta prefix codes

    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None
    tokens: list[tuple] = []
    pos = 0
    while pos < n:
        if use_lz77 and pos >= w and pos + 4 <= n:
            # simple row-copy detector: run of pixels equal to one row up
            run = 0
            while (
                pos + run < n
                and run < 4096
                and (flat[pos + run] == flat[pos + run - w]).all()
            ):
                run += 1
            if run >= 4:
                tokens.append(("copy", run, w))
                if cache is not None:
                    for i in range(run):
                        a, r, g, b = (int(v) for v in flat[pos + i])
                        argb_v = (a << 24) | (r << 16) | (g << 8) | b
                        cache[_cache_hash(argb_v, cache_bits)] = argb_v
                pos += run
                continue
        a, r, g, b = (int(v) for v in flat[pos])
        argb_v = (a << 24) | (r << 16) | (g << 8) | b
        if cache is not None and cache[_cache_hash(argb_v, cache_bits)] == argb_v:
            tokens.append(("cache", _cache_hash(argb_v, cache_bits)))
        else:
            tokens.append(("lit", a, r, g, b))
            if cache is not None:
                cache[_cache_hash(argb_v, cache_bits)] = argb_v
        pos += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            _k, a, r, g, b = t
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif t[0] == "copy":
            _k, length, dist = t
            lp, _e, _eb = _lz77_prefix(length)
            dp, _e2, _eb2 = _lz77_prefix(dist + 120)
            gf[256 + lp] = gf.get(256 + lp, 0) + 1
            df[dp] = df.get(dp, 0) + 1
        else:
            gf[256 + _GREEN_EXTRA + t[1]] = gf.get(256 + _GREEN_EXTRA + t[1], 0) + 1
    # every code must exist even if a channel never appears
    for d in (rf, bf, af):
        if not d:
            d[0] = 1
    if not df:
        df[0] = 1

    green_alpha = 256 + _GREEN_EXTRA + (1 << cache_bits if cache_bits else 0)
    encs = (
        _PrefixEncoder(gf, green_alpha),
        _PrefixEncoder(rf, 256),
        _PrefixEncoder(bf, 256),
        _PrefixEncoder(af, 256),
        _PrefixEncoder(df, _NUM_DIST),
    )
    for e in encs:
        e.write_def(bw)
    ge, re_, be, ae, de = encs
    for t in tokens:
        if t[0] == "lit":
            _k, a, r, g, b = t
            ge.write_sym(bw, g)
            re_.write_sym(bw, r)
            be.write_sym(bw, b)
            ae.write_sym(bw, a)
        elif t[0] == "copy":
            _k, length, dist = t
            lp, ex, exb = _lz77_prefix(length)
            ge.write_sym(bw, 256 + lp)
            if exb:
                bw.write(ex, exb)
            dp, ex2, exb2 = _lz77_prefix(dist + 120)
            de.write_sym(bw, dp)
            if exb2:
                bw.write(ex2, exb2)
        else:
            ge.write_sym(bw, 256 + _GREEN_EXTRA + t[1])


def encode_webp_lossless(
    rgba: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = False,
) -> bytes:
    """(h, w, 4) uint8 RGBA -> WebP (VP8L) bytes. The option flags exist
    to exercise every decoder path; default is a plain literal stream.
    Deterministic. ``predictor_mode`` uses ONE uniform mode over 32x32
    blocks; ``color_transform`` is one uniform (g2r, g2b, r2b) element;
    ``palette`` requires <= 256 distinct colors (bundles when <= 16)."""
    rgba = np.asarray(rgba, dtype=np.uint8)
    h, w, _ = rgba.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(
            f"vp8l encode: dimensions {w}x{h} outside the format's "
            f"14-bit limit (1..16384)"
        )
    if palette and (
        subtract_green or predictor_mode is not None or color_transform is not None
    ):
        raise ValueError(
            "vp8l encode: palette cannot combine with other transforms "
            "here — bundling changes the coded geometry under the "
            "predictor/CT block grid (real encoders use palette XOR the "
            "pixel transforms too)"
        )
    argb = np.stack(
        [rgba[..., 3], rgba[..., 0], rgba[..., 1], rgba[..., 2]], axis=2
    )

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)  # alpha may be used
    bw.write(0, 3)  # version

    # transforms are written (and applied) in stream order; the decoder
    # inverts them in reverse order
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = argb[..., 2].astype(np.uint16)
        argb = argb.copy()
        argb[..., 1] = ((argb[..., 1] - g) & 0xFF).astype(np.uint8)
        argb[..., 3] = ((argb[..., 3] - g) & 0xFF).astype(np.uint8)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        size_bits = max(2, max(w - 1, h - 1).bit_length())
        if size_bits > 9:
            raise ValueError("vp8l encode: image too large for one CT block")
        bw.write(size_bits - 2, 3)
        cts = np.zeros((1, 1, 4), dtype=np.uint8)
        # ARGB element packing: g2r in blue (lowest byte), g2b in green,
        # r2b in red — mirrors _apply_inverse_color_transform
        cts[0, 0] = (255, r2b & 0xFF, g2b & 0xFF, g2r & 0xFF)
        _write_image_stream(bw, cts)
        # forward = exact inverse of _apply_inverse_color_transform
        a = argb.copy()
        r_orig = a[..., 1].astype(np.int32)
        g2r_f = np.full((h, w), g2r & 0xFF, dtype=np.uint8)
        g2b_f = np.full((h, w), g2b & 0xFF, dtype=np.uint8)
        r2b_f = np.full((h, w), r2b & 0xFF, dtype=np.uint8)
        b_enc = (
            a[..., 3].astype(np.int32)
            - _ct_delta(g2b_f, a[..., 2])
            - _ct_delta(r2b_f, a[..., 1])
        ) & 0xFF
        r_enc = (r_orig - _ct_delta(g2r_f, a[..., 2])) & 0xFF
        a[..., 1] = r_enc.astype(np.uint8)
        a[..., 3] = b_enc.astype(np.uint8)
        argb = a
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        size_bits = 5  # 32x32 blocks
        bw.write(size_bits - 2, 3)
        bs = 1 << size_bits
        bwn, bhn = (w + bs - 1) // bs, (h + bs - 1) // bs
        modes = np.zeros((bhn, bwn, 4), dtype=np.uint8)
        modes[..., 0] = 255
        modes[..., 2] = predictor_mode
        _write_image_stream(bw, modes)
        argb = _forward_predict(argb, predictor_mode)
    if palette:
        colors, inverse = np.unique(
            argb.reshape(-1, 4), axis=0, return_inverse=True
        )
        if len(colors) > 256:
            raise ValueError("vp8l encode: > 256 colors, palette impossible")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = np.diff(
            np.vstack([np.zeros((1, 4), np.uint16), colors.astype(np.uint16)]),
            axis=0,
        ).astype(np.uint8)
        _write_image_stream(bw, deltas.reshape(1, -1, 4))
        idx = inverse.reshape(h, w).astype(np.uint8)
        if len(colors) <= 2:
            width_bits = 3
        elif len(colors) <= 4:
            width_bits = 2
        elif len(colors) <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            rw = (w + per - 1) // per
            packed = np.zeros((h, rw), dtype=np.uint8)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= (col << (k * bits)).astype(np.uint8)
            idx_img = packed
        else:
            idx_img = idx
        main = np.zeros((*idx_img.shape, 4), dtype=np.uint8)
        main[..., 2] = idx_img
        argb = main

    bw.write(0, 1)  # no more transforms
    _write_image_stream(
        bw, argb, cache_bits=cache_bits, use_lz77=use_lz77, level0=True
    )

    payload = bytes([0x2F]) + bw.bytes()
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
