"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode modes per stage:
- ``decode="fake"``: deterministic pure-python fake (hash-derived) — the
  plumbing-only mode.
- ``decode="real"``: REAL decode kernels (BMP / PPM / PNG images — PNG
  via stdlib zlib incl. all five row filters, PCM16 WAV audio, RAWV frame
  streams — pure numpy+struct+zlib, see ops/codecs.py).
  JPEG decodes/encodes natively too (ops/jpeg.py — pure numpy
  Huffman+DCT, tables read from the stream, 4:4:4/4:2:2/4:2:0, restart
  intervals; baseline sequential AND progressive
  spectral-selection/successive-approximation streams decode, and the
  encoder emits either mode). ``NotImplementedError`` remains only for
  codecs that genuinely need external libraries (WebP, arithmetic-coded
  JPEG, MP3/H.264 — PIL/libav are not in this container) and is raised at the dispatch point where those would plug
  in.

The Ray side — actor-pool stage, batch sizing for large binaries, output
schema — is identical in both modes and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

MEDIA_COLUMNS = ("media_id", "media_type", "payload", "meta_json")


class ImageFeaturizer:
    """Actor-pool stage: binary image payload -> fixed-dim feature vector.

    __init__ is where a real model would load (once per actor);
    __call__ handles one batch. Small batch_size: payloads are large.
    """

    def __init__(self, dim: int = 16, decode: str = "fake"):
        self.dim = dim
        self.decode = decode

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decode == "real":
            from . import codecs

            # raises NotImplementedError for codecs needing PIL (JPEG...)
            rgb = codecs.decode_image(payload or b"")
            # feature = dim-bin intensity histogram (density) — the
            # deterministic stand-in for a real embedding model's forward
            hist, _ = np.histogram(rgb, bins=self.dim, range=(0, 256))
            return (hist / max(1, rgb.size)).astype(np.float32)
        # deterministic fake: hash-derived pseudo-pixels
        h = hashlib.blake2b(payload or b"", digest_size=self.dim).digest()
        return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode(p) for p in batch["payload"]]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(),
                "feature": [f.tolist() for f in feats],
                "feat_norm": [round(float(np.linalg.norm(f)), 6) for f in feats],
            }
        )


class FrameSampler:
    """Video payload -> every Nth 'frame' (stubbed: fixed-size byte slices).
    Output explodes rows (one per sampled frame) — the real flat_map shape."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4, decode: str = "fake"):
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.decode = decode

    def _frames(self, payload: bytes) -> list[bytes]:
        if self.decode == "real":
            from . import codecs

            kind = codecs.sniff(payload)
            if kind != "rawv":
                raise NotImplementedError(
                    f"compressed video codec ({kind or 'unknown'}) requires "
                    "libav — plug in here (RAWV streams decode natively)"
                )
            return [f.tobytes() for f in codecs.decode_rawv(payload)]
        return [
            payload[i : i + self.frame_bytes]
            for i in range(0, len(payload), self.frame_bytes)
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": [], "frame_idx": [], "frame_sha": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            frames = self._frames(payload or b"")
            for idx in range(0, len(frames), self.stride):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame_sha"].append(hashlib.sha256(frames[idx]).hexdigest()[:16])
        return pd.DataFrame(out)


class ImageResizer:
    """Actor-pool stage: binary image payload -> resized payload + updated
    meta. ``decode="fake"`` performs a deterministic byte-domain
    downsample (every k-th byte) so payload-size semantics, meta rewrite
    and batch sizing are real; ``decode="real"`` is the PIL seam."""

    def __init__(self, target_w: int = 32, target_h: int = 32, decode: str = "fake"):
        self.target_w = target_w
        self.target_h = target_h
        self.decode = decode

    def _resize(self, payload: bytes, meta: str) -> bytes:
        import json as _json

        if self.decode == "real":
            from . import codecs

            from .jpeg import encode_jpeg

            kind = codecs.sniff(payload)
            encoders = {
                "bmp": codecs.encode_bmp,
                "ppm": codecs.encode_ppm,
                "png": codecs.encode_png,
                "jpeg": lambda rgb: encode_jpeg(rgb, quality=85),
            }
            if kind not in encoders:
                raise NotImplementedError(
                    f"compressed image codec ({kind or 'unknown'}) not "
                    "supported — BMP/PPM/PNG/baseline-JPEG resize natively"
                )
            rgb = codecs.decode_image(payload)
            return encoders[kind](
                codecs.resize_nearest(rgb, self.target_w, self.target_h)
            )
        w, h = (
            int(_json.loads(meta or "{}").get(d, 64)) for d in ("w", "h")
        )
        stride = max(1, (w * h) // (self.target_w * self.target_h))
        return payload[::stride]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        out = {"media_id": [], "payload": [], "meta_json": []}
        for mid, payload, meta in zip(
            batch["media_id"], batch["payload"], batch["meta_json"]
        ):
            out["media_id"].append(mid)
            out["payload"].append(self._resize(payload or b"", meta))
            out["meta_json"].append(
                _json.dumps({"w": self.target_w, "h": self.target_h}, sort_keys=True)
            )
        return pd.DataFrame(out).astype({"media_id": "int64"})


def resize_images(
    ds: ray.data.Dataset,
    *,
    target_w: int = 32,
    target_h: int = 32,
    concurrency=2,
    batch_size: int = 8,
    decode: str = "fake",
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h, "decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioTranscriber:
    """Actor-pool stage: binary audio payload -> (transcript, n_segments,
    duration_s). The real seam is an ASR model loaded ONCE per actor in
    __init__ (whisper-style); ``decode="fake"`` runs a deterministic
    hash-derived pseudo-transcript so the schema/plumbing/batch sizing are
    testable in this container."""

    _VOCAB = ("data", "pipeline", "arrow", "stream", "shuffle", "actor", "block")

    def __init__(self, decode: str = "fake", segment_bytes: int = 256):
        self.decode = decode
        self.segment_bytes = segment_bytes

    def _transcribe(self, payload: bytes) -> tuple[str, int, float]:
        if self.decode == "real":
            from . import codecs

            payload = payload or b""
            if codecs.sniff(payload) != "wav":
                raise NotImplementedError(
                    "compressed audio codec requires libav/soundfile — not in "
                    "this container; plug in here (PCM16 WAV decodes natively)"
                )
            samples, rate = codecs.decode_wav(payload)
            duration = len(samples) / rate
            seg_len = max(1, rate)  # 1-second segments
            n_seg = max(1, -(-len(samples) // seg_len))
            # "model": per-segment RMS energy quantized onto the vocab —
            # the deterministic stand-in where a real ASR forward would go
            words = []
            for i in range(n_seg):
                seg = samples[i * seg_len : (i + 1) * seg_len].astype(np.float64)
                rms = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
                words.append(self._VOCAB[int(rms) % len(self._VOCAB)])
            return " ".join(words), n_seg, round(duration, 2)
        payload = payload or b""
        n_seg = max(1, len(payload) // self.segment_bytes)
        words = [
            self._VOCAB[payload[i % max(1, len(payload))] % len(self._VOCAB)]
            if payload
            else self._VOCAB[0]
            for i in range(n_seg * 3)
        ]
        return " ".join(words), n_seg, round(n_seg * 0.96, 2)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": [], "transcript": [], "n_segments": [], "duration_s": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            text, n_seg, dur = self._transcribe(payload)
            out["media_id"].append(mid)
            out["transcript"].append(text)
            out["n_segments"].append(n_seg)
            out["duration_s"].append(dur)
        return pd.DataFrame(out).astype({"media_id": "int64", "n_segments": "int64"})


def transcribe_audio(
    ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 8, decode: str = "fake"
) -> ray.data.Dataset:
    """Actor-pool ASR plumbing: tiny batches (audio payloads are large),
    model state in __init__."""
    return ds.map_batches(
        AudioTranscriber,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def featurize_images(
    ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 32, dim: int = 16,
    decode: str = "fake",
) -> ray.data.Dataset:
    """Actor-pool plumbing: small batches (large binary payloads), state in
    __init__."""
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"dim": dim, "decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    concurrency=2,
    batch_size: int = 8,
    frame_bytes: int = 32,
    stride: int = 2,
    decode: str = "fake",
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride, "decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_media(n: int = 64, fmt: str = "opaque") -> pd.DataFrame:
    """Deterministic media table for tests/demos. fmt="opaque": hash-derived
    blobs (for the fake-decode plumbing tests); fmt="real": genuine
    uncompressed containers — BMP/PPM images, PCM16 WAV audio, RAWV frame
    streams — that the decode="real" kernels parse end to end."""
    import json as _json

    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if fmt == "real":
            from . import codecs

            rng = np.random.RandomState(1000 + i)
            if mtype == "image":
                w, h = 16 + i % 17, 12 + i % 13
                rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                payload = codecs.encode_bmp(rgb) if i % 2 else codecs.encode_ppm(rgb)
                meta = _json.dumps({"w": w, "h": h}, sort_keys=True)
            elif mtype == "audio":
                rate = 8000
                t = np.arange(rate * (1 + i % 3)) / rate
                payload = codecs.encode_wav(
                    0.5 * np.sin(2 * np.pi * (110 + 13 * i) * t), rate
                )
                meta = _json.dumps({"rate": rate}, sort_keys=True)
            else:
                w, h, nf = 8, 6, 4 + i % 5
                frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
                payload = codecs.encode_rawv(frames)
                meta = _json.dumps({"w": w, "h": h, "n_frames": nf}, sort_keys=True)
        else:
            payload = hashlib.blake2b(
                f"media:{i}".encode(), digest_size=32
            ).digest() * (4 + i % 5)
            meta = '{"w": 64, "h": 64}'
        rows.append(
            {
                "media_id": i,
                "media_type": mtype,
                "payload": payload,
                "meta_json": meta,
            }
        )
    return pd.DataFrame(rows)


def synthetic_media_dups(
    modality: str, n_groups: int = 12, dup_every: int = 4
) -> pd.DataFrame:
    """Deterministic single-modality media table with PLANTED near-
    duplicates, the input surface for the q_{image,audio,video}_dup_pairs
    queries: item ``g`` gets media_id ``2*g``; every ``dup_every``-th item
    also emits a TRANSFORMED copy at media_id ``2*g + 1`` —

      image: re-encode of the BMP original, cycling JPEG q85 (pHash
             ~6-8 bits off) / WebP-lossless / GIF (bit-exact pixels) so
             every compressed decoder runs under the driver query,
      audio: half-amplitude re-recording (landmarks are scale-invariant),
      video: copy with the first two frames trimmed (frame pHashes are
             position-independent keys).

    Ground truth is exactly {(2g, 2g+1) : g % dup_every == 0}; distractor
    items are structured but mutually unrelated (block-smooth random
    images / distinct tone mixes / distinct gradient clips), so a correct
    pair stage reports the planted pairs and nothing else."""
    import json as _json

    from . import codecs

    rows = []
    for g in range(n_groups):
        rng = np.random.RandomState(7000 + g)
        if modality == "image":
            # 8x8 random tiles upsampled 8x: block-smooth (JPEG-friendly,
            # tile edges align with the 8x8 DCT grid) yet distinct per g.
            # The planted copy cycles through the three COMPRESSED
            # decoders (JPEG lossy / WebP-lossless / GIF) so the
            # driver-visible dedup query exercises every real codec path
            small = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
            img = np.kron(small, np.ones((8, 8, 1), dtype=np.uint8))
            orig = codecs.encode_bmp(img)
            if g % 3 == 0:
                from .jpeg import encode_jpeg

                dup = encode_jpeg(img, quality=85)
            elif g % 3 == 1:
                from .vp8l import encode_webp_lossless

                rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
                dup = encode_webp_lossless(rgba, subtract_green=True)
            else:
                from .gif import encode_gif

                dup = encode_gif(img)  # <= 64 colors by construction
            meta = _json.dumps({"w": 64, "h": 64}, sort_keys=True)
        elif modality == "audio":
            rate, n = 8000, 16000
            t = np.arange(n)
            x = (
                3000 * np.sin(2 * np.pi * (160 + 23 * g) * t / rate)
                + 2000 * np.sin(2 * np.pi * (1100 + 41 * g) * t / rate)
                + 300 * rng.randn(n)  # noise makes the landmark set rich
            ).astype(np.int16)
            orig = codecs.encode_wav(x, rate)
            dup = codecs.encode_wav((x * 0.5).astype(np.int16), rate)
            meta = _json.dumps({"rate": rate}, sort_keys=True)
        elif modality == "video":
            yy, xx = np.mgrid[0:32, 0:32]
            frames = np.stack(
                [
                    np.stack([((xx * (g + 2) + yy * 3 + k * 9) % 256).astype(np.uint8)] * 3, axis=-1)
                    for k in range(8)
                ]
            )
            orig = codecs.encode_rawv(frames)
            dup = codecs.encode_rawv(frames[2:])
            meta = _json.dumps({"w": 32, "h": 32, "n_frames": 8}, sort_keys=True)
        else:
            raise ValueError(f"synthetic_media_dups: unknown modality {modality!r}")
        rows.append(
            {"media_id": 2 * g, "media_type": modality, "payload": orig, "meta_json": meta}
        )
        if g % dup_every == 0:
            rows.append(
                {"media_id": 2 * g + 1, "media_type": modality, "payload": dup, "meta_json": meta}
            )
    return pd.DataFrame(rows)


# --- perceptual image hashing (pHash) -----------------------------------------
#
# The image analogue of simhash: a 64-bit DCT-based perceptual hash
# (classic pHash recipe — 32x32 grayscale, 2D DCT, the 8x8 low-frequency
# block minus DC thresholded at its median), robust to re-encoding and
# resizing, so crawl image near-dups are detected by Hamming distance
# with the SAME chunk-pigeonhole machinery as text simhash
# (ops/dedup.signature_dup_pairs).

_D32 = None


def _dct32() -> np.ndarray:
    global _D32
    if _D32 is None:
        d = np.zeros((32, 32))
        for u in range(32):
            c = np.sqrt(0.5) if u == 0 else 1.0
            for x in range(32):
                d[u, x] = np.sqrt(2.0 / 32) * c * np.cos(
                    (2 * x + 1) * u * np.pi / 64.0
                )
        _D32 = d
    return _D32


def phash64_signed(rgb: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w[, 3]) uint8 image, returned
    SIGNED int64 (the storage convention signature_dup_pairs expects).
    Deterministic: area-mean downsample over np.array_split bins, exact
    orthonormal DCT, strict > median bit rule."""
    a = rgb.astype(np.float64)
    if a.ndim == 3:
        a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    if a.size == 0:
        raise ValueError("phash64_signed: empty image")
    # images smaller than 32 in either dimension are nearest-upsampled
    # first — otherwise array_split produces EMPTY bins whose mean is
    # NaN and every small image would silently hash to 0
    ih, iw = a.shape
    if ih < 32:
        a = np.repeat(a, -(-32 // ih), axis=0)
    if iw < 32:
        a = np.repeat(a, -(-32 // iw), axis=1)
    # vectorized area-mean over the same bins np.array_split would make:
    # reduceat on the split offsets (rows then columns), divided by the
    # bin-size outer product — no per-cell Python dispatch
    def _splits(n: int) -> np.ndarray:
        base, extra = divmod(n, 32)
        sizes = np.full(32, base, dtype=np.int64)
        sizes[:extra] += 1
        return sizes

    rs, cs = _splits(a.shape[0]), _splits(a.shape[1])
    r_off = np.concatenate(([0], np.cumsum(rs)[:-1]))
    c_off = np.concatenate(([0], np.cumsum(cs)[:-1]))
    summed = np.add.reduceat(np.add.reduceat(a, r_off, axis=0), c_off, axis=1)
    img32 = summed / np.outer(rs, cs)
    d = _dct32()
    freq = d @ img32 @ d.T
    block = freq[:8, :8].ravel()[1:]  # drop the DC term
    bits = block > np.median(block)
    acc = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            acc |= np.uint64(1) << np.uint64(i)
    return int(acc.view(np.int64))


class ImageHasher:
    """Actor-pool stage: binary image payload -> (id, phash). decode
    follows the ImageFeaturizer convention ('real' = ops/codecs, 'fake' =
    hash-derived pseudo-pixels for plumbing tests)."""

    def __init__(self, decode: str = "fake"):
        self.decode = decode

    def _hash(self, payload: bytes) -> int:
        if self.decode == "real":
            from . import codecs

            rgb = codecs.decode_image(payload or b"")
        else:
            # blake2b caps digest_size at 64: seed an RNG instead of
            # asking for 1024 digest bytes
            seed = hashlib.blake2b(payload or b"", digest_size=4).digest()
            rng = np.random.RandomState(np.frombuffer(seed, dtype=np.uint32)[0])
            rgb = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
        return phash64_signed(rgb)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(),
                "phash": pd.Series(
                    [self._hash(p) for p in batch["payload"]], dtype="int64"
                ),
            }
        )


def phash_dup_pairs(
    media: ray.data.Dataset,
    *,
    decode: str = "real",
    max_hamming: int = 8,
    concurrency: int = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Near-duplicate IMAGES by perceptual hash: decode+hash on an actor
    pool (small batches — payloads are large), then the shared
    chunk-pigeonhole Hamming engine. NOTE: the 4x16-bit pigeonhole is
    exhaustive only for hamming <= 3; for the perceptual default (8) it
    is a high-recall candidate generator — same contract as LSH.
    Measured distances on structured images: JPEG re-encode at q85/q50
    ~6-8 bits, half-size resample ~2, unrelated images ~32."""
    from .dedup import signature_dup_pairs

    hashed = media.map_batches(
        ImageHasher,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return signature_dup_pairs(
        hashed,
        "phash",
        "media_id",
        max_hamming=max_hamming,
        what="phash chunk",
    )


# --- audio fingerprinting (spectral landmarks) --------------------------------
#
# The audio analogue of winnowing/pHash: Shazam-style landmark hashes
# (Wang 2003, "An Industrial-Strength Audio Search Algorithm" — public
# paper). Per STFT frame, the peak frequency bin in each of a few
# log-ish bands; consecutive-frame peak pairs (f1, f2, dt) hash to
# 64-bit landmarks. Robust to amplitude scaling (argmax is
# scale-invariant) and mild additive noise; two clips sharing >=
# min_shared landmarks are duplicate candidates.

_FRAME = 1024
_HOP = 512
_BANDS = ((1, 32), (32, 96), (96, 224), (224, 513))  # rfft bins at 1024


def audio_fingerprints(samples: np.ndarray) -> np.ndarray:
    """Landmark hashes (uint64 -> SIGNED int64 array, sorted distinct)
    for one PCM16 mono clip. Deterministic, vectorized: one windowed
    rfft over all frames, per-band argmax, consecutive-frame pairing."""
    from .textstats import _h64

    x = np.asarray(samples, dtype=np.float64)
    if len(x) < _FRAME:
        x = np.pad(x, (0, _FRAME - len(x)))
    n_frames = 1 + (len(x) - _FRAME) // _HOP
    idx = np.arange(_FRAME)[None, :] + _HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(_FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    peaks = np.stack(
        [lo + mag[:, lo:hi].argmax(axis=1) for lo, hi in _BANDS], axis=1
    )  # (n_frames, n_bands)
    out = set()
    for dt in (1, 2):
        if n_frames <= dt:
            continue
        a = peaks[:-dt]
        b = peaks[dt:]
        for band in range(len(_BANDS)):
            for f1, f2 in zip(a[:, band], b[:, band]):
                out.add(_h64(f"{band}:{f1}:{f2}:{dt}".encode()))
    sig = np.array(sorted(out), dtype=np.uint64)
    return sig.view(np.int64)


class AudioFingerprinter:
    """Actor-pool stage: WAV payload -> exploded (media_id, fp) landmark
    rows. decode='real' parses PCM16 WAV via ops/codecs; 'fake' derives
    pseudo-samples from the payload hash (plumbing tests)."""

    def __init__(self, decode: str = "fake"):
        self.decode = decode

    def _samples(self, payload: bytes) -> np.ndarray:
        if self.decode == "real":
            from . import codecs

            samples, _rate = codecs.decode_wav(payload or b"")
            return samples
        h = hashlib.blake2b(payload or b"", digest_size=64).digest()
        rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
        return (rng.randn(4096) * 1000).astype(np.int16)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            sig = audio_fingerprints(self._samples(payload))
            ids.extend([mid] * len(sig))
            fps.extend(sig.tolist())
        return pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "fp": pd.Series(fps, dtype="int64"),
            }
        )


def audio_dup_pairs(
    media: ray.data.Dataset,
    *,
    decode: str = "real",
    min_shared: int = 16,
    max_group_size: int = 512,
    concurrency: int = 2,
    batch_size: int = 16,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Duplicate-audio candidates: clips sharing >= ``min_shared``
    landmark hashes. Explode (fp, id) rows (audio never shuffles), then
    the shared overlap-count pair engine
    (ops/dedup.py:shared_key_pairs — capped groups warn loudly)."""
    from .dedup import shared_key_pairs

    fps = media.map_batches(
        AudioFingerprinter,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return shared_key_pairs(
        fps,
        "fp",
        "media_id",
        min_shared=min_shared,
        max_group_size=max_group_size,
        num_buckets=num_buckets,
        what="audio landmark",
    )


def video_dup_pairs(
    media: ray.data.Dataset,
    *,
    decode: str = "real",
    min_shared: int = 3,
    frame_stride: int = 2,
    max_group_size: int = 512,
    concurrency: int = 2,
    batch_size: int = 8,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Duplicate-video candidates: videos sharing >= ``min_shared``
    per-frame perceptual hashes (every ``frame_stride``-th frame pHashed)
    — robust to re-encoding of individual frames (pHash) and to
    trimming/offset (frame hashes are position-independent keys). The
    composition: frame sampling (actor pool, RAWV decode) -> per-frame
    pHash -> the shared overlap-count pair engine."""
    from .dedup import shared_key_pairs

    class _FramePhasher:
        def __init__(self, decode: str = "fake", stride: int = 2):
            self.decode = decode
            self.stride = stride

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, fps = [], []
            for mid, payload in zip(batch["media_id"], batch["payload"]):
                if self.decode == "real":
                    from . import codecs

                    frames = codecs.decode_rawv(payload or b"")
                else:
                    seed = hashlib.blake2b(payload or b"", digest_size=4).digest()
                    rng = np.random.RandomState(
                        np.frombuffer(seed, dtype=np.uint32)[0]
                    )
                    frames = [
                        rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
                        for _ in range(8)
                    ]
                seen = set()
                for idx in range(0, len(frames), self.stride):
                    seen.add(phash64_signed(np.asarray(frames[idx])))
                ids.extend([mid] * len(seen))
                fps.extend(sorted(seen))
            return pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    fps = media.map_batches(
        _FramePhasher,
        fn_constructor_kwargs={"decode": decode, "stride": frame_stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return shared_key_pairs(
        fps,
        "fp",
        "media_id",
        min_shared=min_shared,
        max_group_size=max_group_size,
        num_buckets=num_buckets,
        what="video frame phash",
    )
