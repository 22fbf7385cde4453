"""Pure-numpy codecs for UNCOMPRESSED media containers — the real decode
kernels behind ops/multimodal's ``decode="real"`` seam. The container has
no PIL/libav, but BMP/PPM/WAV/raw-video are fully specified byte layouts
that numpy + struct decode exactly, so the real path is exercisable end to
end; ``NotImplementedError`` remains only for genuinely compressed codecs
(JPEG/MP3/H.264), raised by the dispatchers in ops/multimodal.

Formats:
- BMP: 24-bit uncompressed (BI_RGB), BGR pixel order, bottom-up rows,
  rows padded to 4 bytes (the classic BITMAPINFOHEADER layout).
- PPM: binary P6, "P6\\n{w} {h}\\n255\\n" + RGB bytes.
- WAV: RIFF/WAVE, PCM 16-bit mono ("fmt " + "data" chunks).
- RAWV: a trivial uncompressed video container used by the synthetic
  fixtures: b"RAWV" + <u32 w, u32 h, u32 n_frames> + n_frames RGB frames
  of w*h*3 bytes each (rawvideo/MJPEG stand-in).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(payload: bytes) -> str | None:
    """Identify an uncompressed container by magic bytes; None = unknown
    (treat as a compressed codec this build cannot decode)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] == b"RAWV":
        return "rawv"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# --- BMP (24-bit BI_RGB) ------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = rgb.shape
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> HxWx3 uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rgb = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


# --- PPM (binary P6) ----------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments not emitted by our encoder; reject them rather than mis-parse)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            raise ValueError("PPM comments unsupported")
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# --- WAV (PCM 16-bit mono) ----------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 (or float in [-1, 1]) mono samples -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = (samples * 32767).astype(np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM, mono, 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes -> (int16 samples, sample rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16).copy()
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


# --- RAWV (uncompressed frame stream) ----------------------------------------


def encode_rawv(frames: np.ndarray) -> bytes:
    """NxHxWx3 uint8 -> RAWV container bytes."""
    n, h, w, _ = frames.shape
    return b"RAWV" + struct.pack("<III", w, h, n) + frames.astype(np.uint8).tobytes()


def decode_rawv(payload: bytes) -> np.ndarray:
    if payload[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack_from("<III", payload, 4)
    return (
        np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3, offset=16)
        .reshape(n, h, w, 3)
        .copy()
    )


def resize_nearest(rgb: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index math — the deterministic kernel
    a real PIL/opencv resize would replace)."""
    h, w, _ = rgb.shape
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return rgb[yi[:, None], xi[None, :]]


# --- PNG (8-bit RGB/RGBA, non-interlaced; stdlib zlib) ------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(rgb: np.ndarray) -> bytes:
    """HxWx3 (or HxWx4) uint8 -> PNG bytes (filter 0 rows, one IDAT)."""
    import zlib

    h, w, ch = rgb.shape
    if ch not in (3, 4):
        raise ValueError("encode_png expects RGB or RGBA")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters 0-4. Sub/Avg/Paeth are per-pixel sequential by
    spec (each byte depends on the reconstructed left neighbour) — fine for
    the fixture-scale images this kernel serves; None/Up rows vectorize."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = line + prev  # uint8 wraps, per spec (mod 256)
        elif ft in (1, 3, 4):
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ft == 1:  # Sub
                    pr = a
                elif ft == 3:  # Average
                    pr = (a + b) >> 1
                else:  # Paeth
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 RGB (8-bit truecolor RGB/RGBA only,
    non-interlaced; alpha dropped). All five row filters supported."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = h = ch = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (2, 6) or interlace != 0:
                raise ValueError(
                    "only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth}, colortype={ctype}, interlace={interlace})"
                )
            if w == 0 or h == 0:
                raise ValueError("png: zero IHDR dimension")
            from .jpeg import MAX_DECODE_PIXELS

            if w * h > MAX_DECODE_PIXELS:
                # IHDR is untrusted crawl input — same allocation bound as
                # decode_jpeg's SOF guard (a tiny payload can declare a
                # 2^32-pixel frame and OOM the decode actor)
                raise ValueError(
                    f"png: frame {h}x{w} exceeds MAX_DECODE_PIXELS="
                    f"{MAX_DECODE_PIXELS}"
                )
            ch = 3 if ctype == 2 else 4
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    return px[:, :, :3].copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch BMP/PPM/PNG/JPEG (baseline + progressive) / GIF /
    WebP-lossless decode by magic; raises NotImplementedError for codecs
    this container genuinely cannot decode (lossy VP8, AVIF,
    arithmetic-coded JPEG etc.)."""
    kind = sniff(payload or b"")
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if kind == "gif":
        from .gif import decode_gif

        return decode_gif(payload)
    if kind == "webp":
        from .vp8l import decode_webp

        # lossless VP8L decodes natively; lossy VP8 / VP8X raise inside
        return decode_webp(payload)[:, :, :3].copy()
    raise NotImplementedError(
        f"compressed image codec ({kind or 'unknown'}) not supported — "
        "BMP/PPM/PNG/JPEG/GIF/WebP-lossless decode natively in this build"
    )


# --- compressed TEXT payloads (crawl / WARC bodies) ---------------------------
#
# Web-crawl page bodies arrive gzip- (WARC convention) or zlib-deflated;
# the text pipeline needs a decode seam just like decode_image. stdlib
# zlib is the same dependency the PNG path already uses.

_TEXT_MAX_BYTES = 256 << 20  # decompression-bomb guard (same spirit as
# decode_jpeg's max-pixels guard: a few-hundred-byte hostile payload can
# declare gigabytes — refuse loudly instead of OOM-killing the actor)


def sniff_text_encoding(payload: bytes) -> str:
    """'gzip' (1f 8b magic — effectively unambiguous in text), 'zlib'
    (RFC 1950: CM=8 in the CMF low nibble, window <= 32K, FDICT clear —
    preset dictionaries can't be inflated here — and the CMF<<8|FLG
    multiple-of-31 FCHECK), else 'raw'. The zlib magic is only TWO
    bytes, so plain text like ``b'x '`` can pass it — callers must treat
    a 'zlib' sniff as a HINT and fall back to raw when inflation fails
    (decode_text_payload does)."""
    if payload[:2] == b"\x1f\x8b":
        return "gzip"
    if (
        len(payload) >= 2
        and (payload[0] & 0x0F) == 8  # CM=8 (deflate)
        and (payload[0] >> 4) <= 7  # window size <= 32K
        and not (payload[1] & 0x20)  # FDICT clear
        and ((payload[0] << 8) | payload[1]) % 31 == 0
    ):
        return "zlib"
    return "raw"


def decode_text_payload(
    payload: bytes,
    *,
    encoding: str = "utf-8",
    errors: str = "replace",
    max_bytes: int = _TEXT_MAX_BYTES,
) -> str:
    """Decode one crawl body: transparent gzip/zlib inflation by magic,
    raw bytes otherwise, then charset decode (``errors='replace'`` — a
    crawl ALWAYS contains mojibake; a decode crash must not kill the
    stage). Inflation is streamed in 1 MiB slices against ``max_bytes``
    so a zip bomb raises ValueError instead of exhausting worker heap.

    Error policy by magic strength: the gzip magic (1f 8b) is
    effectively unambiguous, so a corrupt or TRUNCATED gzip stream
    raises ValueError (silent partial text would poison downstream dedup
    and quality stats). The zlib magic is a 2-byte checksum rule that
    plain text like ``b'x '`` can satisfy, so a 'zlib' sniff that fails
    to inflate cleanly falls back to raw charset decode instead of
    killing the stage on a valid document. Missing payloads (None or a
    pandas NaN cell) decode to ''."""
    import zlib as _z

    if payload is None or not isinstance(payload, (bytes, bytearray, memoryview)):
        return ""  # None, or a NaN cell from an outer join / parquet null
    payload = bytes(payload)
    kind = sniff_text_encoding(payload)
    if kind == "raw":
        return payload.decode(encoding, errors)

    def inflate(kind: str) -> bytes:
        d = _z.decompressobj(wbits=31 if kind == "gzip" else 15)
        out: list[bytes] = []
        total = 0
        data = payload
        while True:
            chunk = d.decompress(data, 1 << 20)
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"decode_text_payload: inflated size exceeds "
                    f"max_bytes={max_bytes} — refusing a decompression bomb"
                )
            out.append(chunk)
            nxt = d.unconsumed_tail
            if d.eof or not nxt:
                break
            if nxt == data and not chunk:  # no progress — corrupt
                raise _z.error("no progress inflating stream")
            data = nxt
        tail = d.flush()  # pending window output at a chunk boundary
        total += len(tail)
        if total > max_bytes:
            raise ValueError(
                f"decode_text_payload: inflated size exceeds "
                f"max_bytes={max_bytes} — refusing a decompression bomb"
            )
        out.append(tail)
        if not d.eof:
            raise _z.error("stream truncated (input exhausted before EOF)")
        return b"".join(out)

    try:
        return inflate(kind).decode(encoding, errors)
    except _z.error as exc:
        if kind == "zlib":
            # ambiguous 2-byte magic: a real text document can sniff as
            # zlib — treat inflation failure as "it was raw after all"
            return payload.decode(encoding, errors)
        raise ValueError(f"decode_text_payload: corrupt {kind} stream: {exc}") from exc


def decompress_text_column(
    ds,
    payload_col: str = "payload",
    out_col: str = "text",
    *,
    encoding: str = "utf-8",
    errors: str = "replace",
    max_bytes: int = _TEXT_MAX_BYTES,
):
    """Dataset stage: binary crawl bodies -> text column (map-only, zero
    shuffle; per-payload zlib work is inherently scalar but the hot loop
    is C inside zlib). Keeps the payload column OUT of the result — at
    100 TB the compressed bytes must not ride along through downstream
    exchanges."""
    import pandas as pd

    def run(b: pd.DataFrame) -> pd.DataFrame:
        o = b.drop(columns=[payload_col]).copy()
        o[out_col] = [
            decode_text_payload(
                p, encoding=encoding, errors=errors, max_bytes=max_bytes
            )
            for p in b[payload_col]
        ]
        return o

    return ds.map_batches(run, batch_format="pandas")
