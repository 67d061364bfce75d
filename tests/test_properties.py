"""Property-based tests (hypothesis) for invariant-heavy kernels."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nmr_fair_dos_ray.codec import (
    delta_decode, delta_encode, varint_decode, varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=200))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip_any_uint64(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varint_encode(arr)
    dec = varint_decode(enc, len(vals)) if len(vals) else varint_decode(enc)
    np.testing.assert_array_equal(dec, arr)


@given(st.lists(st.integers(min_value=0, max_value=1 << 40),
                min_size=1, max_size=200, unique=True))
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip_sorted_ids(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    first, gaps = delta_encode(arr)
    np.testing.assert_array_equal(delta_decode(first, gaps), arr)


@given(st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_ppm_bmp_roundtrip_any_dims(w, h, seed):
    from nmr_fair_dos_ray.stages.multimodal import decode_bmp, decode_ppm

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    ppm = f"P6\n{w} {h}\n255\n".encode() + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(ppm), img)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    header = (
        b"BM" + (54 + rows.size).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + rows.size.to_bytes(4, "little") + b"\0" * 16
    )
    np.testing.assert_array_equal(decode_bmp(header + rows.tobytes()), img)


@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.floats(min_value=0.5, max_value=0.98))
@settings(max_examples=25, deadline=None)
def test_margin_ivf_assignment_never_misses_pairs(seed, tau):
    """The spill-assignment guarantee: every pair with cos >= tau shares at
    least one assigned centroid — for arbitrary data and tau."""
    from nmr_fair_dos_ray.pipelines.ann import _normalize, kmeans_fit

    rng = np.random.RandomState(seed)
    n, d, nc = 40, 8, 6
    vecs = rng.randn(n, d)
    # plant a few tight pairs so the property is non-vacuous sometimes
    vecs[1] = vecs[0] + rng.randn(d) * 0.01
    vecs[3] = vecs[2] + rng.randn(d) * 0.05
    m = _normalize(vecs.astype(np.float64))
    c = kmeans_fit(vecs.astype(np.float32), nc).astype(np.float64)
    ang = np.arccos(np.clip(m @ c.T, -1, 1))
    best = ang.min(axis=1, keepdims=True)
    margin = float(np.arccos(np.clip(tau, -1.0, 1.0)))
    assign = ang <= best + margin + 1e-9
    sims = m @ m.T
    iu, ju = np.triu_indices(n, k=1)
    for i, j in zip(iu[sims[iu, ju] >= tau], ju[sims[iu, ju] >= tau]):
        assert (assign[i] & assign[j]).any(), (i, j, float(sims[i, j]))


@given(st.lists(st.tuples(st.sampled_from(["k1", "k2", "k3"]),
                          st.text(max_size=8),
                          st.sampled_from(["a", "b", None])),
                max_size=40))
@settings(max_examples=50, deadline=None)
def test_builder_dedup_invariants(entries):
    from nmr_fair_dos_ray.pipelines.extract import PIDRecordBuilder

    b = PIDRecordBuilder("p")
    for k, v, n in entries:
        b.add(k, v, n)
    rows = b.rows()
    # no duplicate (key, value); first name wins; order preserved
    seen = set()
    for _, k, _, v in rows:
        assert (k, v) not in seen
        seen.add((k, v))
    expected_first = {}
    for k, v, n in entries:
        expected_first.setdefault((k, v), n)
    for _, k, n, v in rows:
        assert n == expected_first[(k, v)]
