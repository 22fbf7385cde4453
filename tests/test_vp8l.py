"""WebP-lossless (VP8L) codec: round trips across the full decode-path
matrix, a HAND-BUILT wire fixture (bit-level, so symmetric encoder/
decoder misreadings cannot pass), strictness, and the decode_image seam."""

from __future__ import annotations

import numpy as np
import pytest

from ocds_entity_extract_ray.ops.vp8l import decode_webp, encode_webp_lossless

RNG = np.random.RandomState(7)
IMG = RNG.randint(0, 256, (19, 23, 4), dtype=np.uint8)


def _rt(img, **kw):
    out = decode_webp(encode_webp_lossless(img, **kw))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


def test_plain_and_subtract_green_and_cache():
    _rt(IMG)
    _rt(IMG, subtract_green=True)
    _rt(IMG, cache_bits=6)
    _rt(IMG[:1, :1])  # 1x1
    _rt(IMG[:1])      # single row
    _rt(IMG[:, :1])   # single column


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode(mode):
    _rt(IMG, predictor_mode=mode)


def test_color_transform_and_combination():
    _rt(IMG, color_transform=(33, -52, 17))
    _rt(IMG, color_transform=(-128, 127, 1))
    _rt(IMG, subtract_green=True, predictor_mode=11)


@pytest.mark.parametrize("ncol", [2, 3, 9, 40, 200])
def test_palette_bundled_and_plain(ncol):
    pal = RNG.randint(0, 256, (ncol, 4), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    pimg = pal[RNG.randint(0, len(pal), (11, 29))]
    _rt(pimg, palette=True)


def test_lz77_and_cache_paths():
    rimg = np.tile(RNG.randint(0, 256, (2, 31, 4), dtype=np.uint8), (8, 1, 1))
    _rt(rimg, use_lz77=True)
    _rt(rimg, use_lz77=True, cache_bits=4)


def _pack_lsb(bits):
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        out[i >> 3] |= b << (i & 7)
    return bytes(out)


def test_hand_built_wire_fixture():
    """1x1 VP8L stream derived BIT BY BIT from the spec (not produced by
    this repo's encoder): five simple prefix codes, single-symbol each,
    so the pixel costs zero data bits. A symmetric bit-order or layout
    misreading in encoder+decoder cannot make this pass."""
    bits = []
    bits += [0] * 14                      # width - 1 = 0
    bits += [0] * 14                      # height - 1 = 0
    bits += [0]                           # alpha hint
    bits += [0, 0, 0]                     # version = 0
    bits += [0]                           # no transforms
    bits += [0]                           # no color cache
    bits += [0]                           # no meta prefix codes

    def simple_one(sym8):                 # simple code, ONE 8-bit symbol
        return [1, 0, 1] + [(sym8 >> i) & 1 for i in range(8)]

    bits += simple_one(0x42)              # green literal 0x42
    bits += simple_one(0x10)              # red 0x10
    bits += simple_one(0x20)              # blue 0x20
    bits += simple_one(0xFF)              # alpha 0xFF
    bits += [1, 0, 0, 0]                  # distance: simple, 1 sym, 1-bit, 0
    # data: every code is single-symbol -> zero bits for the pixel

    payload = bytes([0x2F]) + _pack_lsb(bits)
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff = b"WEBP" + vp8l
    data = b"RIFF" + len(riff).to_bytes(4, "little") + riff

    out = decode_webp(data)
    assert out.shape == (1, 1, 4)
    # ARGB (FF, 10, 42, 20) -> RGBA (10, 42, 20, FF)
    assert out[0, 0].tolist() == [0x10, 0x42, 0x20, 0xFF]


def test_strictness_and_gates():
    good = encode_webp_lossless(IMG)
    with pytest.raises(ValueError):
        decode_webp(good[:30])  # truncated bitstream
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")  # not WebP
    # lossy VP8 is gated, not mis-decoded
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)


def test_decode_image_seam_and_phash():
    """The crawl path: decode_image dispatches WebP by magic and the
    perceptual hash of the decoded pixels matches the raw-pixel hash."""
    from ocds_entity_extract_ray.ops.codecs import decode_image
    from ocds_entity_extract_ray.ops.multimodal import phash64_signed

    rgb = decode_image(encode_webp_lossless(IMG))
    assert (rgb == IMG[:, :, :3]).all()
    big = np.repeat(np.repeat(IMG, 3, axis=0), 3, axis=1)  # >=32px for pHash
    assert phash64_signed(
        decode_image(encode_webp_lossless(big))
    ) == phash64_signed(big[:, :, :3])


def test_encoder_is_deterministic():
    a = encode_webp_lossless(IMG, subtract_green=True, cache_bits=5)
    b = encode_webp_lossless(IMG, subtract_green=True, cache_bits=5)
    assert a == b


def test_review_pins():
    """Pins for the review findings: dimension bounds, simple-code symbol
    range, incomplete-code rejection, palette-combination guard, and the
    C-truncation predictor-13 rule."""
    with pytest.raises(ValueError, match="14-bit"):
        encode_webp_lossless(np.zeros((1, 16385, 4), np.uint8))
    with pytest.raises(ValueError, match="palette cannot combine"):
        encode_webp_lossless(
            np.zeros((4, 4, 4), np.uint8), palette=True, predictor_mode=2
        )
    # predictor 13 truncates toward zero: avg2=10, TL=15 -> 10 + (-5)/2 = 8
    from ocds_entity_extract_ray.ops.vp8l import _predict

    L = np.array([10, 10, 10, 10], np.uint8)
    T = np.array([10, 10, 10, 10], np.uint8)
    TL = np.array([15, 15, 15, 15], np.uint8)
    assert _predict(13, L, T, TL, T).tolist() == [8, 8, 8, 8]

    # a malformed stream: distance code = simple 1-symbol with symbol 200
    # (alphabet 40) must raise ValueError, not IndexError
    def pack(bits):
        out = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)

    def simple_one(sym8):
        return [1, 0, 1] + [(sym8 >> i) & 1 for i in range(8)]

    bits = [0] * 32 + [0, 0, 0]
    for s in (0x42, 0x10, 0x20, 0xFF):
        bits += simple_one(s)
    bits += simple_one(200)  # distance alphabet is 40: out of range
    payload = bytes([0x2F]) + pack(bits)
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff = b"WEBP" + vp8l
    with pytest.raises(ValueError, match="simple code"):
        decode_webp(b"RIFF" + len(riff).to_bytes(4, "little") + riff)


def test_property_round_trip_random_options():
    """Hypothesis-style sweep without the fixture overhead: 40 seeded
    (image, option) combinations round-trip exactly — shapes from 1x1 to
    33x31, every option that composes."""
    import itertools

    shapes = [(1, 1), (2, 3), (7, 5), (16, 16), (33, 31), (4, 29)]
    opts = [
        {},
        {"subtract_green": True},
        {"cache_bits": 3},
        {"predictor_mode": 12},
        {"color_transform": (-7, 100, -100)},
        {"subtract_green": True, "predictor_mode": 7, "cache_bits": 2},
        {"use_lz77": True},
    ]
    rng = np.random.RandomState(99)
    for (hh, ww), kw in itertools.product(shapes, opts):
        img = rng.randint(0, 256, (hh, ww, 4), dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(img, **kw))
        assert (out == img).all(), (hh, ww, kw)
