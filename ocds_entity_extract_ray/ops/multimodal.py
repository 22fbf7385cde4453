"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

The actual codecs are NOT in this container, so the decode kernels are
STUBBED — ``decode=\"fake\"`` runs a deterministic pure-python fake (real
schema, real plumbing, testable), ``decode=\"real\"`` raises
NotImplementedError at the exact seam where PIL/libav would plug in. The
Ray side — actor-pool stage, batch sizing for large binaries, output
schema — is real and tested.
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
            raise NotImplementedError(
                "image decode requires PIL/torchvision — not in this container; "
                "plug the real decoder here"
            )
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.decode == "real":
            raise NotImplementedError("video decode requires libav — plug in here")
        out = {"media_id": [], "frame_idx": [], "frame_sha": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            payload = payload or b""
            frames = [
                payload[i : i + self.frame_bytes]
                for i in range(0, len(payload), self.frame_bytes)
            ]
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        if self.decode == "real":
            raise NotImplementedError(
                "image resize requires PIL — not in this container; plug in here"
            )
        out = {"media_id": [], "payload": [], "meta_json": []}
        for mid, payload, meta in zip(
            batch["media_id"], batch["payload"], batch["meta_json"]
        ):
            payload = payload or b""
            m = _json.loads(meta or "{}")
            w, h = int(m.get("w", 64)), int(m.get("h", 64))
            stride = max(1, (w * h) // (self.target_w * self.target_h))
            out["media_id"].append(mid)
            out["payload"].append(payload[::stride])
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
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
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
            raise NotImplementedError(
                "audio decode/ASR requires soundfile + a model — not in this "
                "container; plug the real transcriber here"
            )
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
    ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 8
) -> ray.data.Dataset:
    """Actor-pool ASR plumbing: tiny batches (audio payloads are large),
    model state in __init__."""
    return ds.map_batches(
        AudioTranscriber,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def featurize_images(
    ds: ray.data.Dataset, *, concurrency=2, batch_size: int = 32, dim: int = 16
) -> ray.data.Dataset:
    """Actor-pool plumbing: small batches (large binary payloads), state in
    __init__."""
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"dim": dim},
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
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_media(n: int = 64) -> pd.DataFrame:
    """Deterministic fake media table for tests/demos."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest() * (
            4 + i % 5
        )
        rows.append(
            {
                "media_id": i,
                "media_type": ["image", "audio", "video"][i % 3],
                "payload": payload,
                "meta_json": '{"w": 64, "h": 64}',
            }
        )
    return pd.DataFrame(rows)
