"""Augmentation op tests: the two-pass affine warp against the exact
gather-based 2D bilinear reference (``bilinear_sample``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.ops import image as I


def _mats(thetas_deg, scales, tx, ty):
    """Inverse maps for forward A = R(theta) * s, translation (tx, ty)
    in pixels (same convention as augment._affine_mats)."""
    out = []
    for th, s, x, y in zip(thetas_deg, scales, tx, ty):
        t = math.radians(th)
        a, b = math.cos(t) * s, -math.sin(t) * s
        c, d = math.sin(t) * s, math.cos(t) * s
        det = a * d - b * c
        ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
        out.append([[ia, ib, -(ia * x + ib * y)],
                    [ic, id_, -(ic * x + id_ * y)]])
    return jnp.asarray(out, jnp.float32)


def _reference_warp(imgs, mats):
    B, H, W, C = imgs.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    sy = mats[:, 1, 0, None, None] * xs + mats[:, 1, 1, None, None] * ys \
        + mats[:, 1, 2, None, None] + cy
    sx = mats[:, 0, 0, None, None] * xs + mats[:, 0, 1, None, None] * ys \
        + mats[:, 0, 2, None, None] + cx
    return jax.vmap(I.bilinear_sample)(imgs, sy, sx)


@pytest.fixture
def smooth_batch(rng):
    # smooth images: random low-res upsampled, so sub-pixel sampling
    # differences stay small
    lo = rng.random((3, 6, 6, 1)).astype(np.float32)
    return jax.image.resize(jnp.asarray(lo), (3, 48, 48, 1), "bilinear")


def test_twopass_exact_for_scale_translate(smooth_batch):
    """rotation = shear = 0 makes the decomposition algebraically
    identical to 2D bilinear (the tent product separates)."""
    mats = _mats([0, 0, 0], [0.9, 1.0, 1.15], [3.5, -2.0, 0.0], [-1.5, 0.0, 4.25])
    ref = _reference_warp(smooth_batch, mats)
    got = I.warp_affine_twopass(smooth_batch, mats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_twopass_close_for_rotation(smooth_batch):
    """With rotation the horizontal sample position differs by at most
    |sin(theta)*s| pixels between the two blended rows — tiny for the
    config ranges that pass ``twopass_safe``."""
    mats = _mats([10, -7, 4], [1.0, 0.95, 1.1], [1.0, 0.0, -2.0], [0.0, 2.0, 1.0])
    ref = np.asarray(_reference_warp(smooth_batch, mats))
    got = np.asarray(I.warp_affine_twopass(smooth_batch, mats))
    assert np.abs(got - ref).mean() < 0.01
    assert np.abs(got - ref).max() < 0.2


def test_twopass_zero_fill(smooth_batch):
    """Samples mapped outside the image must come back 0 (reference
    affine fill), including via large translations."""
    mats = _mats([0.0, 5.0, 0.0], [1.0, 1.0, 1.0],
                 [100.0, 100.0, -100.0], [0.0, 100.0, -100.0])
    got = np.asarray(I.warp_affine_twopass(smooth_batch, mats))
    ref = np.asarray(_reference_warp(smooth_batch, mats))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.abs(got).max() < 1e-6  # fully shifted out


def test_twopass_odd_chunking(smooth_batch):
    """H not divisible by the budgeted chunk: falls back to a divisor."""
    x = smooth_batch[:, :42, :42, :]  # 42 = 2*3*7
    mats = _mats([3.0], [1.05], [1.0], [-1.0])[0:1]
    got = np.asarray(I.warp_affine_twopass(x[:1], mats, weight_budget_mb=1))
    ref = np.asarray(_reference_warp(x[:1], mats))
    assert np.abs(got - ref).mean() < 0.01


def test_banded_resample_exact(smooth_batch):
    """The row-banded dense resampler must equal the unbanded one (and
    the gather reference) when the band bound holds."""
    mats = _mats([10, -7, 0], [1.0, 0.95, 1.1], [2.0, -3.0, 0.0], [1.0, 0.0, -4.0])
    B, H, W, C = smooth_batch.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] - cy
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] - cx
    sy = mats[:, 1, 0, None, None] * xs + mats[:, 1, 1, None, None] * ys \
        + mats[:, 1, 2, None, None] + cy
    sx = mats[:, 0, 0, None, None] * xs + mats[:, 0, 1, None, None] * ys \
        + mats[:, 0, 2, None, None] + cx
    sy = jnp.broadcast_to(sy, (B, H, W))
    sx = jnp.broadcast_to(sx, (B, H, W))
    band = I.affine_row_band(10.0, 0.0, 0.15, W)
    ref = np.asarray(jax.vmap(I.bilinear_sample)(smooth_batch, sy, sx))
    dense = np.asarray(I.resample_bilinear_mxu(smooth_batch, sy, sx))
    banded = np.asarray(I.resample_bilinear_mxu(smooth_batch, sy, sx,
                                                row_band=band))
    np.testing.assert_allclose(dense, ref, atol=0.02)  # bf16 weights
    np.testing.assert_array_equal(banded, dense)


def test_warp_dense_banded_exact(smooth_batch, rng):
    """warp_dense with a static displacement bound must equal the
    unbanded form and the gather reference."""
    B, H, W, C = smooth_batch.shape
    dy = jnp.asarray(rng.uniform(-5, 5, (B, H, W)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-5, 5, (B, H, W)), jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None] + dy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None] + dx
    ref = np.asarray(jax.vmap(I.bilinear_sample)(smooth_batch, ys, xs))
    plain = np.asarray(I.resample_bilinear_mxu(smooth_batch, ys, xs))
    banded = np.asarray(I.resample_bilinear_mxu(smooth_batch, ys, xs,
                                                row_band=15 + 10 + 3))
    np.testing.assert_allclose(plain, ref, atol=0.02)
    np.testing.assert_array_equal(banded, plain)


def test_affine_row_band_bounds():
    # no rotation: band is just the chunk extent + tent support
    assert I.affine_row_band(0.0, 0.0, 0.0, 224) == 18
    # canonical config stays far below full height
    assert I.affine_row_band(10.0, 0.0, 0.15, 224) < 80
    # extreme rotation: band exceeds H -> resampler falls back to dense
    assert I.affine_row_band(80.0, 0.0, 0.5, 224) > 224
    # near-zero minimum scale: no finite band is sound -> banding off
    assert I.affine_row_band(5.0, 0.0, 0.95, 224) > (1 << 20)
    assert I.affine_row_band(5.0, 0.0, 1.5, 224) > (1 << 20)


def test_twopass_safe_bounds():
    assert I.twopass_safe(10.0, 5.0, 0.15)        # canonical config
    assert I.twopass_safe(45.0, 0.0, 0.1)
    assert not I.twopass_safe(85.0, 0.0, 0.0)     # near-degenerate
    assert not I.twopass_safe(60.0, 20.0, 0.9)


def test_clahe_mxu_matches_gather(rng):
    """The int8 one-hot matmul CLAHE must equal the gather formulation
    (LUT entries and one-hot weights are exact in the integer dots)."""
    from primia_tpu.ops import image as I

    x = jnp.asarray(rng.random((2, 48, 40, 3)), jnp.float32)
    a = np.asarray(I.clahe_mxu(x, 1.0, 8))
    b = np.asarray(I._clahe_channels(x, 1.0, 8))  # gather path off-TPU
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_lab_roundtrip_identity():
    """rgb -> LAB(u8 scale) -> rgb. Unquantized LAB must reproduce
    every uint8 level to within 1 level (the math is an exact inverse;
    the only freedom is f32 rounding). With LAB quantized to uint8 —
    what cv2's 8-bit pipeline stores — dark and saturated colours may
    move many levels (L packs 100 points into 255 levels, and the sRGB
    gamma steepens the dark end): the exhaustive worst case over the
    full 256^3 cube is 26 levels. Local deterministic pixels (NOT the
    shared session rng — the draw must not depend on test order)."""
    from primia_tpu.ops import image as I

    local = np.random.default_rng(42)
    x = jnp.asarray(local.integers(0, 256, (2, 17, 19, 3)), jnp.float32) / 255.0
    back = np.asarray(I.lab_u8_to_rgb(I.rgb_to_lab_u8(x)))
    assert np.abs(back - np.asarray(x)).max() <= 1.01 / 255.0
    back_q = np.asarray(I.lab_u8_to_rgb(jnp.round(I.rgb_to_lab_u8(x))))
    assert np.abs(back_q - np.asarray(x)).max() <= 26.01 / 255.0


def test_lab_gray_is_neutral(rng):
    """Grey pixels (R=G=B) sit exactly on the neutral LAB axis: the
    RGB->XYZ rows sum to the white point, so a = b = 128."""
    from primia_tpu.ops import image as I

    g = jnp.asarray(rng.integers(0, 256, (1, 8, 8, 1)), jnp.float32) / 255.0
    lab = np.asarray(I.rgb_to_lab_u8(jnp.tile(g, (1, 1, 1, 3))))
    np.testing.assert_allclose(lab[..., 1], 128.0, atol=5e-3)
    np.testing.assert_allclose(lab[..., 2], 128.0, atol=5e-3)


def test_lab_golden_values_cv2():
    """Non-tautological LAB check: golden values captured from
    ``cv2.cvtColor(COLOR_RGB2LAB)`` (cv2 5.0). cv2's 8-bit path applies
    sRGB linearization through its gamma LUT — grey RGB(128,128,128)
    maps to L=137, NOT the linear formula's 194 — and its fixed-point
    table interpolation deviates from the exact float formula by up to
    ~2 levels, so the tolerance is 2."""
    from primia_tpu.ops import image as I

    pix = np.array(
        [[0, 0, 0], [255, 255, 255], [128, 128, 128], [50, 50, 50],
         [64, 128, 192], [200, 30, 100], [10, 250, 90], [230, 240, 250]],
        np.float32)
    golden = np.array(  # cv2.cvtColor(pix_u8, cv2.COLOR_RGB2LAB)
        [[0, 128, 128], [255, 128, 128], [137, 128, 128], [53, 128, 128],
         [133, 128, 89], [113, 195, 133], [221, 48, 189], [241, 127, 122]],
        np.float64)
    ours = np.asarray(I.rgb_to_lab_u8(pix[None, None] / 255.0))[0, 0]
    assert np.abs(ours - golden).max() <= 2.0

    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)
    ref = cv2.cvtColor(u8[0], cv2.COLOR_RGB2LAB).astype(np.float64)[None]
    ours = np.asarray(I.rgb_to_lab_u8(u8.astype(np.float32) / 255.0))
    assert np.abs(ours - ref).max() <= 2.0
    # inverse against cv2 LAB2RGB (uint8 in, uint8 levels out)
    lab = rng.integers(0, 256, (1, 32, 32, 3), np.uint8)
    ref_b = cv2.cvtColor(lab[0], cv2.COLOR_LAB2RGB).astype(np.float64)[None]
    ours_b = np.asarray(I.lab_u8_to_rgb(lab.astype(np.float64))) * 255.0
    assert np.abs(ours_b - ref_b).max() <= 2.0


def test_clahe_3ch_is_lab_luminance(rng):
    """albumentations semantics (functional.clahe): 3-channel CLAHE
    equalizes the LAB L channel only. Replicated-grey input must stay
    grey, and the result must equal hand-composing the LAB pipeline
    around the per-channel backend."""
    from primia_tpu.ops import image as I

    x = jnp.asarray(rng.random((2, 48, 40, 3)), jnp.float32)
    got = np.asarray(I.clahe(x, 1.0, 8))
    lab = I.rgb_to_lab_u8(x)
    L_eq = I._clahe_channels(lab[..., :1] / 255.0, 1.0, 8)
    want = I.lab_u8_to_rgb(
        jnp.concatenate(
            [jnp.round(L_eq * 255.0), jnp.round(lab[..., 1:])], axis=-1))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)

    grey = jnp.tile(jnp.asarray(rng.random((1, 48, 40, 1)), jnp.float32),
                    (1, 1, 1, 3))
    out = np.asarray(I.clahe(grey, 1.0, 8))
    assert np.abs(out - out[..., :1]).max() <= 1.01 / 255.0
    # and the equalization actually did something
    assert np.abs(out - np.asarray(grey)).max() > 2.0 / 255.0


def test_full_pipeline_every_toggle(rng):
    """All 19 albumentations toggles + affine + crop + noise at once:
    must trace, run, and produce a normalized train-res batch."""
    from primia_tpu.ops.augment import AugmentConfig, build_augment_fn

    cfg = AugmentConfig(
        rotation=10.0, translate=0.1, scale=0.1, shear=3.0,
        train_resolution=32, inference_resolution=40, clahe=True,
        overall_prob=0.9, individual_prob=0.5, noise_std=0.05,
        noise_prob=0.5, randomgamma=True, randombrightness=True, blur=True,
        elastic=True, optical_distortion=True, grid_distortion=True,
        grid_shuffle=True, hsv=True, invert=True, cutout=True, shadow=True,
        fog=True, sun_flare=True, solarize=True, equalize=True,
        grid_dropout=True,
    )
    mean, std = np.array([0.5, 0.5, 0.5]), np.array([0.25, 0.25, 0.25])
    fn = jax.jit(build_augment_fn(cfg, mean, std, 3))
    x = rng.integers(0, 255, (4, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(x)))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()
    # normalized output: values land in [(0-mean)/std, (1-mean)/std]
    assert out.min() >= -2.0 - 1e-3 and out.max() <= 2.0 + 1e-3


def test_pipeline_deterministic_per_key(rng):
    from primia_tpu.ops.augment import AugmentConfig, build_augment_fn

    cfg = AugmentConfig(rotation=5.0, noise_std=0.05, noise_prob=1.0,
                        randomgamma=True, train_resolution=24,
                        inference_resolution=24)
    fn = jax.jit(build_augment_fn(cfg, np.array([0.5]), np.array([0.25]), 1))
    x = jnp.asarray(rng.integers(0, 255, (2, 24, 24, 1), dtype=np.uint8))
    a = np.asarray(fn(jax.random.PRNGKey(7), x))
    b = np.asarray(fn(jax.random.PRNGKey(7), x))
    c = np.asarray(fn(jax.random.PRNGKey(8), x))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_warp_affine_dispatch(smooth_batch):
    """warp_affine(twopass=True) must agree with the dense path."""
    mats = _mats([8.0, 0.0, -8.0], [1.0, 1.1, 0.9], [2.0, 0.0, -2.0],
                 [0.0, 1.0, -1.0])
    dense = np.asarray(I.warp_affine(smooth_batch, mats, twopass=False))
    fast = np.asarray(I.warp_affine(smooth_batch, mats, twopass=True))
    assert np.abs(fast - dense).mean() < 0.01
