"""Native (C++/ctypes) host-runtime library: build, parity, fallbacks.

The library (native/src/primia_native.cpp) is the C++ analogue of the
reference's Rust ``shaloop`` dependency (fss.py:14); every binding has a
numpy fallback, and these tests pin native == fallback exactly.
"""

import hashlib
import importlib

import numpy as np
import pytest

from primia_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@requires_native
def test_keystream_matches_hashlib():
    seed = native._seed32(1234)
    ks = native.sha256_keystream(1234, 80)
    want = b"".join(
        hashlib.sha256(bytes(seed) + i.to_bytes(8, "big")).digest() for i in range(3)
    )[:80]
    assert bytes(ks) == want


@requires_native
def test_encode_and_share_reconstructs():
    rng = np.random.default_rng(0)
    x = rng.uniform(-100, 100, (33, 7)).astype(np.float32)
    x[0, :4] = [(2 * i + 1) / 2 / 65536 for i in range(4)]  # exact .5 ties
    s0, s1 = native.encode_and_share(x, 16, 42)
    rec = (s0.view(np.uint64) + s1.view(np.uint64)).view(np.int64)
    enc = np.round(x.astype(np.float64) * (1 << 16)).astype(np.int64)
    np.testing.assert_array_equal(rec, enc)
    # shares individually look uniform, not like the value
    assert not np.array_equal(s0, enc)


@requires_native
def test_encode_and_share_matches_fallback(monkeypatch):
    rng = np.random.default_rng(1)
    x = rng.uniform(-5, 5, 257).astype(np.float32)
    s0, s1 = native.encode_and_share(x, 16, 7)
    monkeypatch.setenv("PRIMIA_NO_NATIVE", "1")
    fb = importlib.reload(native)
    try:
        f0, f1 = fb.encode_and_share(x, 16, 7)
    finally:
        monkeypatch.delenv("PRIMIA_NO_NATIVE")
        importlib.reload(native)
    np.testing.assert_array_equal(s0, f0)
    np.testing.assert_array_equal(s1, f1)


@requires_native
def test_percentile_stretch_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.integers(100, 4000, (64, 64)).astype(np.uint16)
    got = native.percentile_stretch(img, 5, 95)
    lo, hi = np.percentile(img, [5, 95], method="inverted_cdf")
    want = np.clip((img.astype(np.float64) - lo) / max(hi - lo, 1.0), 0, 1)
    want = (want * 255.0 + 0.5).astype(np.uint8)
    # histogram-rank vs numpy interpolation can differ by one level
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 2


@requires_native
def test_resize_bilinear_identity_and_shape():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 16, 16, 1), dtype=np.uint8)
    same = native.resize_bilinear(imgs, 16, 16)
    np.testing.assert_array_equal(same, imgs)
    up = native.resize_bilinear(imgs, 32, 48)
    assert up.shape == (2, 32, 48, 1)
    # constant image stays constant under any resize
    const = np.full((1, 10, 10, 3), 77, np.uint8)
    np.testing.assert_array_equal(native.resize_bilinear(const, 23, 9), 77)


def test_serve_share_stream_reconstructs(tmp_path):
    """get_data_shares end-to-end through the node (native or fallback)."""
    from primia_tpu.mpc import fixed
    from primia_tpu.serve.node import GridNode

    node = GridNode("data_owner")
    rng = np.random.default_rng(4)
    node.store["#inference_data"] = rng.uniform(-2, 2, (3, 4, 4, 1)).astype(
        np.float32
    )
    r0 = node.handle({"type": "get_data_shares", "party": 0, "seed": 5})
    r1 = node.handle({"type": "get_data_shares", "party": 1, "seed": 5})
    rec = (
        r0["share"].view(np.uint64) + r1["share"].view(np.uint64)
    ).view(np.int64)
    dec = np.asarray(rec, np.float64) / (1 << r0["frac_bits"])
    np.testing.assert_allclose(dec, node.store["#inference_data"], atol=2 ** -15)
