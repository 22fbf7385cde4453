"""JPEG (ITU-T T.81) encode/decode in pure numpy/stdlib — the
compressed-image kernel behind ops/codecs.decode_image, closing the
biggest real-data multimodal gap (crawl images are overwhelmingly JPEG;
reference seam: ops/multimodal.ImageFeaturizer).

Scope (documented contract):
  - DECODE: baseline sequential (SOF0/1) AND progressive (SOF2 —
    spectral selection, successive approximation, EOB runs, DC/AC
    refinement, interleaved and non-interleaved scans) DCT with Huffman
    entropy coding, 8-bit, grayscale or YCbCr with sampling factors in
    {1, 2} (4:4:4, 4:2:2, 4:2:0), restart intervals. Quant + Huffman
    tables are read FROM THE STREAM, so externally produced files decode
    without any table assumptions. Arithmetic coding, 12-bit, lossless
    and hierarchical modes raise NotImplementedError by marker; so does
    non-interleaved multi-scan BASELINE (rare; refusing beats silently
    color-shifted output).
  - ENCODE: baseline sequential or progressive (``progressive=True`` —
    a libjpeg-style scan script; fixed 9/10-bit AC table so the encoder
    stays one-pass), standard Annex-K quant (quality-scaled the libjpeg
    way), 4:4:4 or 4:2:0, used to synthesize deterministic
    test/benchmark payloads (no image libs in the container). Both modes
    code IDENTICAL quantized coefficients, which is what lets the tests
    assert progressive decode == baseline decode bit-for-bit.

Performance shape: the DCT/IDCT, quantization, color transforms and
upsampling are vectorized over all blocks (einsum); only the entropy
coder is a Python loop over symbols — fine for the thumbnail-sized
payloads the multimodal stages batch, and isolated behind the actor-pool
``map_batches`` seam so a compiled codec can replace it without touching
any pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

# Hostile-input allocation bound: SOF headers are untrusted crawl bytes,
# and a 20-byte payload can declare a 65535x65535 frame whose coefficient
# planes would allocate tens of GB before any bitstream check fires. 64M
# pixels (8192x8192) comfortably covers real crawl photos; decode_jpeg
# raises ValueError above it. Module-level so a trusted caller can raise it.
MAX_DECODE_PIXELS = 64_000_000

# --- constants (ITU-T T.81 Annex K) ------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

_QUANT_LUMA = np.array(
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
)
_QUANT_CHROMA = np.array(
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
)

_DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II orthonormal basis: block_dct = D @ X @ D.T, idct = D.T @ Y @ D
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base quant table."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    n = h8 // 8
    m = w8 // 8
    return blocks.reshape(n, m, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)


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
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_plane_blocks(
    blocks: np.ndarray, quant: np.ndarray
) -> np.ndarray:
    """(n,8,8) spatial (level-shifted) -> (n,64) zigzagged quantized ints."""
    coeffs = np.einsum("ij,njk,lk->nil", _D, blocks.astype(np.float64), _D)
    q = quant.reshape(8, 8)
    quantized = np.round(coeffs / q).astype(np.int64)
    return quantized.reshape(-1, 64)[:, ZIGZAG]


# Fixed Huffman table for progressive AC scans: all 256 (run, size)
# symbols at 9-10 bits. Progressive needs the EOBn codes (r<<4 for
# 1 <= r <= 14) that the Annex-K sequential tables don't contain;
# a per-scan optimized table would compress better, but a fixed legal
# table keeps the encoder one-pass (the decoder reads whatever tables
# the stream carries, so this is an encoder-size tradeoff only).
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(256))


def encode_jpeg(
    rgb: np.ndarray, *, quality: int = 85, subsample: str = "444",
    restart_interval: int = 0, progressive: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    baseline sequential (or, with ``progressive=True``, progressive
    spectral-selection + successive-approximation) JFIF JPEG.
    ``subsample``: '444' or '420'."""
    if subsample not in ("444", "420"):
        raise ValueError(f"encode_jpeg: subsample must be 444/420, got {subsample}")
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    qy = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    if gray:
        planes = [rgb.astype(np.float64)]
        samps = [(1, 1)]
        quants = [qy]
    else:
        f = rgb.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # pad to even, then average 2x2
            he, we = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [qy, qc, qc]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane to its MCU-aligned size, level-shift, block, quantize
    comp_blocks = []
    comp_bw = []  # blocks-per-MCU-row (width in blocks)
    for plane, (hs, vs), quant in zip(planes, samps, quants):
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        comp_blocks.append(_encode_plane_blocks(_blocks(padded - 128.0), quant))
        comp_bw.append(pw // 8)

    if progressive:
        return _encode_progressive(
            h, w, gray, comp_blocks, comp_bw, samps,
            (qy, qc), mcux, mcuy, restart_interval,
        )

    dc_tabs = [
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    tab_of = [0] + [1] * (len(planes) - 1)

    bw = _BitWriter()
    scan = bytearray()
    pred = [0] * len(planes)
    mcu_index = 0
    rst = 0

    def emit_block(ci: int, zz: np.ndarray) -> None:
        nonlocal pred
        dc_tab, ac_tab = dc_tabs[tab_of[ci]], ac_tabs[tab_of[ci]]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, bits = _magnitude(diff)
        code, ln = dc_tab[s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | s]
            bw.write(code, ln)
            bw.write(bits, s)
            run = 0
        if run:
            code, ln = ac_tab[0x00]  # EOB
            bw.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                scan.extend(bw.out)
                bw.out = bytearray()
                scan.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                pred = [0] * len(planes)
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        row = my * vs + by
                        col = mx * hs + bx
                        emit_block(ci, comp_blocks[ci][row * comp_bw[ci] + col])
            mcu_index += 1
    bw.flush()
    scan.extend(bw.out)

    # --- container (quant tables are stored in zigzag order) ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    tables = ((0, qy), (1, qc)) if not gray else ((0, qy),)
    for tid, q in tables:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q[ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (hs, vs) in enumerate(samps):
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    hts = [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if not gray:
        hts += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        td_ta = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, td_ta])
    out += bytes([0, 63, 0])
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder -------------------------------------------------------


class _ScanWriter:
    """Per-scan bit writer with restart-marker segmentation. ``boundary``
    must be called before each data unit with a callback that flushes any
    buffered entropy state (EOB runs / correction bits) into the stream."""

    def __init__(self, restart_interval: int) -> None:
        self.bw = _BitWriter()
        self.data = bytearray()
        self.ri = restart_interval
        self.units = 0
        self.rst = 0

    def boundary(self, flush_state) -> bool:
        if self.ri and self.units and self.units % self.ri == 0:
            flush_state()
            self.bw.flush()
            self.data += self.bw.out
            self.bw.out = bytearray()
            self.data += bytes([0xFF, 0xD0 + (self.rst & 7)])
            self.rst += 1
            return True
        return False

    def finish(self, flush_state) -> bytes:
        flush_state()
        self.bw.flush()
        self.data += self.bw.out
        return bytes(self.data)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shifted toward zero (T.81 G.1.2.2)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _encode_progressive(
    h: int,
    w: int,
    gray: bool,
    comp_blocks: list,
    comp_bw: list,
    samps: list,
    quants: tuple,
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> bytes:
    """Emit the scan script: interleaved DC first (Al=1), per-component
    spectral AC-first scans at Al>0, then DC + AC refinement scans —
    exercising every progressive decode path (spectral selection,
    successive approximation, EOB runs, ZRL-in-refinement). The coded
    coefficients are IDENTICAL to the baseline encoder's, so decode
    output is bit-equal to the baseline stream's decode."""
    ncomp = len(samps)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    dc_codes = [
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_prog = _build_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    dc_tab_of = [0] + [1] * (ncomp - 1)

    def comp_nblocks(ci: int) -> tuple[int, int]:
        hs, vs = samps[ci]
        csx = -(-w * hs // hmax)
        csy = -(-h * vs // vmax)
        return -(-csx // 8), -(-csy // 8)

    scans: list[tuple[bytes, bytes]] = []  # (SOS header payload, entropy data)

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        out = bytearray([len(comp_ids)])
        for ci in comp_ids:
            # DC table per component family; AC always the shared table 0
            out += bytes([ci + 1, (dc_tab_of[ci] << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])
        return bytes(out)

    # --- DC scans (interleaved over all components, MCU order) ---
    def dc_first_scan(al: int) -> None:
        sw = _ScanWriter(restart_interval)
        pred = [0] * ncomp

        def reset() -> None:
            pred[:] = [0] * ncomp

        for my in range(mcuy):
            for mx in range(mcux):
                sw.boundary(reset)
                for ci, (hs, vs) in enumerate(samps):
                    tab = dc_codes[dc_tab_of[ci]]
                    for by in range(vs):
                        for bx in range(hs):
                            idx = (my * vs + by) * comp_bw[ci] + mx * hs + bx
                            v = int(comp_blocks[ci][idx][0]) >> al
                            s, bits = _magnitude(v - pred[ci])
                            pred[ci] = v
                            code, ln = tab[s]
                            sw.bw.write(code, ln)
                            if s:
                                sw.bw.write(bits, s)
                sw.units += 1
        scans.append((sos_header(list(range(ncomp)), 0, 0, 0, al), sw.finish(lambda: None)))

    def dc_refine_scan(al: int) -> None:
        sw = _ScanWriter(restart_interval)
        for my in range(mcuy):
            for mx in range(mcux):
                sw.boundary(lambda: None)
                for ci, (hs, vs) in enumerate(samps):
                    for by in range(vs):
                        for bx in range(hs):
                            idx = (my * vs + by) * comp_bw[ci] + mx * hs + bx
                            sw.bw.write((int(comp_blocks[ci][idx][0]) >> al) & 1, 1)
                sw.units += 1
        scans.append((sos_header(list(range(ncomp)), 0, 0, al + 1, al), sw.finish(lambda: None)))

    # --- AC scans (single component, its own block raster) ---
    def emit_eobrun(sw: _ScanWriter, st: dict) -> None:
        if st["eobrun"] > 0:
            nbits = st["eobrun"].bit_length() - 1
            code, ln = ac_prog[nbits << 4]
            sw.bw.write(code, ln)
            if nbits:
                sw.bw.write(st["eobrun"] - (1 << nbits), nbits)
            st["eobrun"] = 0
        for b in st["be"]:
            sw.bw.write(b, 1)
        st["be"] = []

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> None:
        sw = _ScanWriter(restart_interval)
        st = {"eobrun": 0, "be": []}
        nbx, nby = comp_nblocks(ci)
        for by in range(nby):
            for bx in range(nbx):
                sw.boundary(lambda: emit_eobrun(sw, st))
                zz = comp_blocks[ci][by * comp_bw[ci] + bx]
                run = 0
                for k in range(ss, se + 1):
                    t = _pt_ac(int(zz[k]), al)
                    if t == 0:
                        run += 1
                        continue
                    emit_eobrun(sw, st)
                    while run > 15:
                        code, ln = ac_prog[0xF0]
                        sw.bw.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(t)
                    code, ln = ac_prog[(run << 4) | s]
                    sw.bw.write(code, ln)
                    sw.bw.write(bits, s)
                    run = 0
                if run:
                    st["eobrun"] += 1
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun(sw, st)
                sw.units += 1
        scans.append((sos_header([ci], ss, se, 0, al), sw.finish(lambda: emit_eobrun(sw, st))))

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> None:
        # the public libjpeg jcphuff.c encode_mcu_AC_refine structure
        sw = _ScanWriter(restart_interval)
        st = {"eobrun": 0, "be": []}
        nbx, nby = comp_nblocks(ci)
        for by in range(nby):
            for bx in range(nbx):
                sw.boundary(lambda: emit_eobrun(sw, st))
                zz = comp_blocks[ci][by * comp_bw[ci] + bx]
                absv = [0] * (se + 1)
                eob = ss - 1
                for k in range(ss, se + 1):
                    a = abs(int(zz[k])) >> al
                    absv[k] = a
                    if a == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    a = absv[k]
                    if a == 0:
                        r += 1
                        continue
                    # ZRLs that cannot fold into the trailing EOB
                    while r > 15 and k <= eob:
                        emit_eobrun(sw, st)
                        code, ln = ac_prog[0xF0]
                        sw.bw.write(code, ln)
                        r -= 16
                        for b in br:
                            sw.bw.write(b, 1)
                        br = []
                    if a > 1:  # previously nonzero: correction bit only
                        br.append(a & 1)
                        continue
                    emit_eobrun(sw, st)
                    code, ln = ac_prog[(r << 4) | 1]
                    sw.bw.write(code, ln)
                    sw.bw.write(0 if int(zz[k]) < 0 else 1, 1)
                    for b in br:
                        sw.bw.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    st["eobrun"] += 1
                    st["be"].extend(br)
                    if st["eobrun"] == 0x7FFF:
                        emit_eobrun(sw, st)
                sw.units += 1
        scans.append((sos_header([ci], ss, se, al + 1, al), sw.finish(lambda: emit_eobrun(sw, st))))

    if gray:
        dc_first_scan(1)
        ac_first_scan(0, 1, 63, 1)
        dc_refine_scan(0)
        ac_refine_scan(0, 1, 63, 0)
    else:
        dc_first_scan(1)
        ac_first_scan(0, 1, 5, 2)
        ac_first_scan(1, 1, 63, 1)
        ac_first_scan(2, 1, 63, 1)
        ac_first_scan(0, 6, 63, 2)
        ac_refine_scan(0, 1, 63, 1)
        dc_refine_scan(0)
        ac_refine_scan(1, 1, 63, 0)
        ac_refine_scan(2, 1, 63, 0)
        ac_refine_scan(0, 1, 63, 0)

    # --- container ---
    qy, qc = quants
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    tables = ((0, qy), (1, qc)) if not gray else ((0, qy),)
    for tid, q in tables:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q[ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (hs, vs) in enumerate(samps):
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    hts = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_PROG_BITS, _AC_PROG_VALS)]
    if not gray:
        hts.insert(1, (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits[1:17]) + bytes(vals)
    for header, data in scans:
        out += b"\xff\xda" + struct.pack(">H", 2 + len(header)) + header
        out += data
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: bitstream exhausted mid-scan")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("jpeg: invalid Huffman code in scan")


def _extend(bits: int, s: int) -> int:
    """Magnitude-decode: s appended bits -> signed value."""
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


def _destuff_segments(scan_data: bytes) -> list[bytes]:
    """Split entropy-coded data on restart markers; destuff 0xFF00."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(scan_data)
    while i < n:
        b = scan_data[i]
        if b == 0xFF and i + 1 < n:
            nxt = scan_data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments


def _decode_unit(
    reader: "_BitReader",
    zz: np.ndarray,
    *,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tab,
    ac_tab,
    pred: list,
    ci: int,
    eobrun: list,
) -> None:
    """Decode ONE data unit (8x8 block, zigzag coeff vector ``zz`` mutated
    in place) for any scan kind: sequential full-band (ss=0, se=63),
    progressive DC first/refine (ss=se=0), progressive AC first/refine
    (ss>=1). Algorithms follow T.81 G.1.2 / the public libjpeg
    jdphuff.c structure. ``pred[ci]`` carries the DC predictor;
    ``eobrun[0]`` the progressive end-of-band run."""
    if ss == 0:
        if ah == 0:  # DC first (or the DC part of a sequential scan)
            s = reader.read_huff(dc_tab)
            diff = _extend(reader.read_bits(s), s) if s else 0
            pred[ci] += diff
            zz[0] = pred[ci] << al
        else:  # DC refinement: one bit
            if reader.read_bit():
                zz[0] |= 1 << al
        if se == 0:
            return
    k = max(ss, 1)
    if ah == 0:  # AC first (sequential scans land here with al=0)
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = reader.read_huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                # EOBn: run of 2^r + appended bits blocks (r=0 == plain
                # EOB, which is also the only form baseline emits)
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("jpeg: AC run past band end")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return
    # AC refinement (T.81 G.1.2.3)
    p1 = 1 << al
    m1 = -1 << al
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.read_huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s:
                if s != 1:
                    raise ValueError("jpeg: invalid refinement magnitude")
                s = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun[0] = 1 << r
                if r:
                    eobrun[0] += reader.read_bits(r)
                break
            # advance over r zero-history coeffs, refining nonzero ones
            while k <= se:
                coef = int(zz[k])
                if coef != 0:
                    if reader.read_bit() and (coef & p1) == 0:
                        zz[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = s
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            coef = int(zz[k])
            if coef != 0:
                if reader.read_bit() and (coef & p1) == 0:
                    zz[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential OR progressive JPEG to (h, w, 3)
    uint8 RGB (grayscale replicates to 3 channels). Raises
    NotImplementedError for arithmetic-coded / hierarchical / 12-bit
    streams, ValueError for malformed data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    progressive = False
    scans: list[dict] = []

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # T.81 allows any number of 0xFF FILL bytes before a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            break
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                tab = _build_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            if fh == 0 or fw == 0:
                raise ValueError("jpeg: zero frame dimension in SOF")
            if fh * fw > MAX_DECODE_PIXELS:
                # the SOF header is UNTRUSTED crawl input: a few-hundred-byte
                # payload declaring 65535x65535 would otherwise allocate tens
                # of GB of coefficient/pixel planes before any bitstream
                # check fires, OOM-killing the decode actor
                raise ValueError(
                    f"jpeg: frame {fh}x{fw} exceeds MAX_DECODE_PIXELS="
                    f"{MAX_DECODE_PIXELS} (raise ops.jpeg.MAX_DECODE_PIXELS "
                    "if the oversized payload is trusted)"
                )
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sf >> 4, sf & 0xF, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: non-baseline frame (marker 0xFF{marker:02X} — "
                "lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            # entropy-coded data runs from here to the next real marker
            dstart = pos + seglen
            dpos = dstart
            while dpos < len(payload) - 1:
                if payload[dpos] == 0xFF and payload[dpos + 1] not in (0x00,) and not (
                    0xD0 <= payload[dpos + 1] <= 0xD7
                ):
                    break
                dpos += 1
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "segments": _destuff_segments(payload[dstart:dpos]),
                    "ri": restart_interval,
                    # DHT may redefine tables between scans: snapshot refs
                    "dc": dict(huff_dc),
                    "ac": dict(huff_ac),
                }
            )
            pos = dpos
            continue
        pos += seglen

    if frame is None or not scans:
        raise ValueError("jpeg: missing SOF/SOS")
    fh, fw, comps = frame

    if not progressive:
        if len(scans) != 1 or len(scans[0]["comps"]) != len(comps):
            # spec-legal non-interleaved multi-scan baseline: one SOS per
            # component — decoding only the first scan would return silently
            # wrong (color-shifted) pixels, so refuse loudly instead
            raise NotImplementedError(
                "jpeg: multi-scan (non-interleaved) baseline stream — only "
                "single-scan interleaved baseline is supported"
            )
        # sequential scans decode as the full 0..63 band, no approximation
        scans[0]["ss"], scans[0]["se"] = 0, 63
        scans[0]["ah"] = scans[0]["al"] = 0
    for _cid, hs, vs, _tq in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            raise NotImplementedError(
                f"jpeg: sampling factors {hs}x{vs} outside the supported "
                "{1,2} set (4:4:4 / 4:2:2 / 4:2:0)"
            )

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    comp_coeffs = {
        c[0]: np.zeros((mcuy * c[2] * mcux * c[1], 64), dtype=np.int64) for c in comps
    }
    comp_bw = {c[0]: mcux * c[1] for c in comps}

    for scan in scans:
        order = [by_id[sc[0]] for sc in scan["comps"]]
        dc_of = {sc[0]: sc[1] for sc in scan["comps"]}
        ac_of = {sc[0]: sc[2] for sc in scan["comps"]}
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        ri = scan["ri"]
        seg_iter = iter(scan["segments"])
        reader = _BitReader(next(seg_iter))
        pred = [0] * len(order)
        eobrun = [0]
        units_in_seg = 0

        def _restart():
            nonlocal reader, pred, eobrun, units_in_seg
            reader = _BitReader(next(seg_iter))
            pred = [0] * len(order)
            eobrun = [0]
            units_in_seg = 0

        if len(order) > 1:  # interleaved: MCU traversal
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and units_in_seg == ri:
                        _restart()
                    for ci, (cid, hs, vs, _tq) in enumerate(order):
                        dc_tab = scan["dc"].get(dc_of[cid])
                        ac_tab = scan["ac"].get(ac_of[cid])
                        for byy in range(vs):
                            for bxx in range(hs):
                                row = my * vs + byy
                                col = mx * hs + bxx
                                _decode_unit(
                                    reader,
                                    comp_coeffs[cid][row * comp_bw[cid] + col],
                                    ss=ss, se=se, ah=ah, al=al,
                                    dc_tab=dc_tab, ac_tab=ac_tab,
                                    pred=pred, ci=ci, eobrun=eobrun,
                                )
                    units_in_seg += 1
        else:  # non-interleaved: the component's own block raster
            cid, hs, vs, _tq = order[0]
            csx = -(-fw * hs // hmax)
            csy = -(-fh * vs // vmax)
            nbx, nby = -(-csx // 8), -(-csy // 8)
            dc_tab = scan["dc"].get(dc_of[cid])
            ac_tab = scan["ac"].get(ac_of[cid])
            for by in range(nby):
                for bx in range(nbx):
                    if ri and units_in_seg == ri:
                        _restart()
                    _decode_unit(
                        reader,
                        comp_coeffs[cid][by * comp_bw[cid] + bx],
                        ss=ss, se=se, ah=ah, al=al,
                        dc_tab=dc_tab, ac_tab=ac_tab,
                        pred=pred, ci=0, eobrun=eobrun,
                    )
                    units_in_seg += 1

    # dequantize + IDCT, vectorized over all blocks per component
    planes = {}
    for cid, hs, vs, tq in comps:
        zz = comp_coeffs[cid]
        deq = np.zeros_like(zz)
        deq[:, ZIGZAG] = zz * quant[tq][ZIGZAG]
        blocks = deq.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        plane = _unblocks(spatial, ph, pw)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:fh, :fw]

    if len(comps) == 1:
        # round like the color path (truncation would bias -1 LSB)
        y = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(comps) != 3:
        raise NotImplementedError(f"jpeg: {len(comps)}-component scan")
    y = planes[comps[0][0]]
    cb = planes[comps[1][0]] - 128.0
    cr = planes[comps[2][0]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
