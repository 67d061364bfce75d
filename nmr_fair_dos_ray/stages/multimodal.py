"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
*decode kernels* are deterministic fakes behind a clearly marked seam
(`_decode_image_real` raises NotImplementedError), while everything Ray-side
is real and tested: schema (binary column + metadata), actor-pool stage
shape, small-batch sizing for wide binary rows, and Arrow-native outputs
(fixed-shape tensors as list columns).

At 100 TB the rules these stages encode: batches of wide binary rows must be
small (``batch_size`` 16-64) so batch × concurrency fits worker heaps;
decode state (codec tables, models) loads once per actor in ``__init__``;
outputs are fixed-width arrays, never Python objects.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

IMAGE_META = ("width", "height", "channels", "format")


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decoder seam — requires an image codec library (not in container)."""
    raise NotImplementedError(
        "image codec libraries unavailable in this environment; "
        "the deterministic fake below exercises the full Ray-side plumbing"
    )


def _decode_image_fake(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic fake decode: seeded by payload sha256 → stable pixels."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, channels), dtype=np.uint8)


class ImageDecodeStage:
    """binary payload + metadata → decoded pixel tensor (flattened list col).

    Use: ``ds.map_batches(ImageDecodeStage, batch_size=32, concurrency=N,
    batch_format="pyarrow")`` — small batches because rows are wide.
    """

    def __init__(self, use_real_codec: bool = False):
        self.use_real_codec = use_real_codec  # once-per-actor codec init seam

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels, ok = [], []
        for payload, w, h, c in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["channels"].to_pylist(),
        ):
            try:
                img = (
                    _decode_image_real(payload)
                    if self.use_real_codec
                    else _decode_image_fake(payload, w, h, c)
                )
                pixels.append(img.ravel().tolist())
                ok.append(True)
            except NotImplementedError:
                pixels.append([])
                ok.append(False)
        return batch.append_column(
            "pixels", pa.array(pixels, pa.list_(pa.uint8()))
        ).append_column("decoded", pa.array(ok, pa.bool_()))


class ImageResizeStage:
    """Nearest-neighbor resize of decoded tensors — pure numpy, vectorized."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for pix, w, h, c in zip(
            batch["pixels"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["channels"].to_pylist(),
        ):
            if not pix:
                out.append([])
                continue
            img = np.asarray(pix, np.uint8).reshape(h, w, c)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            out.append(img[yi][:, xi].ravel().tolist())
        return batch.append_column("pixels_resized", pa.array(out, pa.list_(pa.uint8())))


class AudioFrameSampleStage:
    """binary audio payload → every-Nth-frame int16 samples (fake decode)."""

    def __init__(self, stride: int = 100, frame_count: int = 64):
        self.stride = stride
        self.frame_count = frame_count

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = []
        for payload in batch["payload"].to_pylist():
            seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "big")
            rng = np.random.RandomState(seed)
            samples = rng.randint(-32768, 32767, size=self.frame_count * self.stride)
            frames.append(samples[:: self.stride].astype(np.int16).tolist())
        return batch.append_column("frames", pa.array(frames, pa.list_(pa.int16())))


def attach_binary_payload(docs: Dataset, text_col: str = "text",
                          width: int = 8, height: int = 8, channels: int = 3) -> Dataset:
    """Test helper: derive a deterministic binary payload column + image
    metadata from a text column (stands in for real image bytes)."""

    def make(batch: pa.Table) -> pa.Table:
        payloads = [
            hashlib.sha256((t or "").encode()).digest() * 4
            for t in batch[text_col].to_pylist()
        ]
        n = batch.num_rows
        return batch.append_column("payload", pa.array(payloads, pa.binary())) \
            .append_column("width", pa.array([width] * n, pa.int32())) \
            .append_column("height", pa.array([height] * n, pa.int32())) \
            .append_column("channels", pa.array([channels] * n, pa.int32())) \
            .append_column("format", pa.array(["fake"] * n, pa.string()))

    return docs.map_batches(make, batch_format="pyarrow")
