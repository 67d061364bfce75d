"""Baseline JPEG codec (stages/jpeg.py): round-trip + format handling."""

import numpy as np
import pytest

from nmr_fair_dos_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def test_constant_image_near_exact():
    img = np.full((16, 24, 3), 97, np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_grayscale_non_multiple_of_8():
    g = (np.arange(19 * 30).reshape(19, 30) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (19, 30, 1)
    assert _psnr(out[:, :, 0], g) > 35


def test_smooth_rgb_high_psnr():
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert _psnr(out, img) > 32


def test_random_rgb_roundtrip_deterministic():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 56, 3), np.uint8)
    enc = encode_jpeg(img)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    out1 = decode_jpeg(enc)
    out2 = decode_jpeg(enc)
    assert np.array_equal(out1, out2)  # bit-deterministic decode
    assert _psnr(out1, img) > 20  # lossy but faithful at flat q=16


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"nope")
    # splice an SOF2 (progressive) marker in place of SOF0
    enc = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_image_stage_decodes_jpeg_for_real():
    import pyarrow as pa

    from nmr_fair_dos_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (24, 16, 3), np.uint8)
    payload = encode_jpeg(img)
    stage = ImageDecodeStage()
    b = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([16], pa.int64()),
        "height": pa.array([24], pa.int64()),
        "channels": pa.array([3], pa.int64()),
        "format": pa.array(["jpeg"]),
    })
    out = stage(b)
    row = out.to_pylist()[0]
    assert row["decoded"]
    got = np.array(row["pixels"], np.uint8).reshape(24, 16, 3)
    assert _psnr(got, img) > 20
    # corrupt payload dead-letters instead of failing the task (M17 pattern)
    bad = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"\xff\xd8broken"], pa.binary()),
        "width": pa.array([4], pa.int64()),
        "height": pa.array([4], pa.int64()),
        "channels": pa.array([3], pa.int64()),
        "format": pa.array(["jpeg"]),
    })
    assert stage(bad).to_pylist()[0]["decoded"] is False
