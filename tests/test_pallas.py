"""Pallas kernel parity (interpreter mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_resample_pallas_matches_gather():
    from primia_tpu.ops.image import bilinear_sample
    from primia_tpu.ops.pallas_kernels import resample_bilinear_pallas

    B, H, W, C = 2, 32, 32, 1
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    ys = jax.random.uniform(key, (B, H, W), minval=-3.0, maxval=H + 2.0)
    xs = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W),
                            minval=-3.0, maxval=W + 2.0)
    got = np.asarray(resample_bilinear_pallas(imgs, ys, xs, interpret=True))
    want = np.asarray(jax.vmap(bilinear_sample)(imgs, ys, xs))
    np.testing.assert_allclose(got, want, atol=6e-3)  # bf16 weights


def test_resample_pallas_multichannel():
    from primia_tpu.ops.image import bilinear_sample
    from primia_tpu.ops.pallas_kernels import resample_bilinear_pallas

    B, H, W, C = 1, 16, 16, 3
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    ys = jnp.broadcast_to(jnp.linspace(0.0, H - 1, H)[:, None], (H, W))[None]
    xs = jnp.broadcast_to(jnp.linspace(0.0, W - 1, W)[None, :], (H, W))[None]
    got = np.asarray(resample_bilinear_pallas(imgs, ys, xs, interpret=True))
    want = np.asarray(jax.vmap(bilinear_sample)(imgs, ys, xs))
    np.testing.assert_allclose(got, want, atol=6e-3)


def test_noise_pallas_distribution():
    from primia_tpu.ops.pallas_kernels import add_gaussian_noise_pallas

    x = jnp.zeros((4, 64, 64, 1), jnp.float32)
    try:
        out = add_gaussian_noise_pallas(x, 3, 0.1, interpret=True)
    except Exception as e:  # hardware PRNG not emulated everywhere
        pytest.skip(f"prng interpret unsupported: {e}")
    n = np.asarray(out).ravel() / 0.1
    assert abs(n.mean()) < 0.05
    assert abs(n.std() - 1.0) < 0.05
    # rows get distinct streams
    assert not np.array_equal(np.asarray(out)[0], np.asarray(out)[1])


class TestClahePallas:
    def test_matches_xla_formulation(self):
        from primia_tpu.ops.image import clahe_mxu
        from primia_tpu.ops.pallas_clahe import clahe_pallas

        rng = np.random.default_rng(3)
        imgs = rng.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32)
        ref = np.asarray(clahe_mxu(jnp.asarray(imgs), 1.0, 8))
        got = np.asarray(clahe_pallas(jnp.asarray(imgs), 1.0, 8, interpret=True))
        # only freedom is f32 summation order in the CDF -> sub-level
        np.testing.assert_allclose(got, ref, atol=0.51 / 255.0)
        assert (np.abs(got - ref) * 255 > 0.01).mean() < 1e-3

    def test_multichannel_and_odd_size(self):
        """Non-tile-divisible resolution exercises the edge-pad path."""
        from primia_tpu.ops.image import clahe_mxu
        from primia_tpu.ops.pallas_clahe import clahe_pallas

        rng = np.random.default_rng(4)
        imgs = rng.uniform(0, 1, (2, 100, 100, 3)).astype(np.float32)
        ref = np.asarray(clahe_mxu(jnp.asarray(imgs), 2.0, 8))
        got = np.asarray(clahe_pallas(jnp.asarray(imgs), 2.0, 8, interpret=True))
        np.testing.assert_allclose(got, ref, atol=0.51 / 255.0)

    def test_flat_image_is_stable(self):
        """A constant image: clipped histogram redistribution must not
        produce NaNs or drift (limit floor kicks in)."""
        from primia_tpu.ops.pallas_clahe import clahe_pallas

        imgs = np.full((1, 64, 64, 1), 0.5, np.float32)
        out = np.asarray(clahe_pallas(jnp.asarray(imgs), 1.0, 8, interpret=True))
        assert np.isfinite(out).all()
        assert out.std() < 1e-3  # stays (nearly) flat


class TestTentPallas:
    """ops/pallas_tent.py — the default TPU warp kernels."""

    def test_tent_matches_gather(self):
        from primia_tpu.ops.image import bilinear_sample
        from primia_tpu.ops.pallas_tent import resample_tent_pallas

        B, H, W, C = 2, 32, 40, 3
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        key = jax.random.PRNGKey(0)
        ys = jax.random.uniform(key, (B, H, W), minval=-3.0, maxval=H + 2.0)
        xs = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W),
                                minval=-3.0, maxval=W + 2.0)
        got = np.asarray(resample_tent_pallas(imgs, ys, xs, interpret=True))
        want = np.asarray(jax.vmap(bilinear_sample)(imgs, ys, xs))
        np.testing.assert_allclose(got, want, atol=6e-3)  # bf16 weights

    def test_tent_nonsquare_output_and_chunk_pad(self):
        """Ho*Wo not a multiple of the 128-lane chunk exercises the
        coordinate padding (pad pixels must not pollute real ones)."""
        from primia_tpu.ops.image import bilinear_sample
        from primia_tpu.ops.pallas_tent import resample_tent_pallas

        B, H, W = 1, 24, 24
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32))
        key = jax.random.PRNGKey(2)
        ys = jax.random.uniform(key, (B, 11, 13), minval=0.0, maxval=H - 1.0)
        xs = jax.random.uniform(jax.random.fold_in(key, 1), (B, 11, 13),
                                minval=0.0, maxval=W - 1.0)
        got = np.asarray(resample_tent_pallas(imgs, ys, xs, interpret=True))
        want = np.asarray(jax.vmap(bilinear_sample)(imgs, ys, xs))
        np.testing.assert_allclose(got, want, atol=6e-3)

    def test_shear_matches_twopass(self):
        """The Pallas lane-gather two-pass warp implements exactly the
        warp_affine_twopass math (same conditioning contract)."""
        from primia_tpu.ops.image import warp_affine_twopass
        from primia_tpu.ops.pallas_tent import warp_affine_shear_pallas

        B, H, W, C = 2, 32, 32, 3
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        mats = []
        for b, (deg, s, tx, ty) in enumerate(
                [(7.0, 1.06, 1.5, -2.0), (-4.0, 0.93, -0.5, 3.0)]):
            a = np.deg2rad(deg)
            mats.append(np.array(
                [[np.cos(a) / s, -np.sin(a) / s, tx],
                 [np.sin(a) / s, np.cos(a) / s, ty]], np.float32))
        mats = jnp.asarray(np.stack(mats))
        got = np.asarray(warp_affine_shear_pallas(imgs, mats, interpret=True))
        want = np.asarray(warp_affine_twopass(imgs, mats))
        np.testing.assert_allclose(got, want, atol=8e-3)  # bf16 pixels

    def test_shear_identity_is_exact(self):
        from primia_tpu.ops.pallas_tent import warp_affine_shear_pallas

        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
        eye = jnp.asarray(np.array([[[1, 0, 0], [0, 1, 0]]], np.float32))
        got = np.asarray(warp_affine_shear_pallas(imgs, eye, interpret=True))
        np.testing.assert_allclose(got, np.asarray(imgs), atol=4e-3)

    def test_tent_banded_matches_dense(self):
        """max_dy banding (the distortion-warp fast path) must be exact
        when the displacement bound holds."""
        from primia_tpu.ops.image import bilinear_sample
        from primia_tpu.ops.pallas_tent import resample_tent_pallas

        B, H, W = 1, 128, 128  # Pc=3584 -> 28-row chunks, Hb=48 < H
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.random((B, H, W, 2), dtype=np.float32))
        base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
        base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]
        dy = jnp.asarray(rng.uniform(-5, 5, (B, H, W)).astype(np.float32))
        dx = jnp.asarray(rng.uniform(-9, 9, (B, H, W)).astype(np.float32))
        got = np.asarray(resample_tent_pallas(imgs, base_y + dy, base_x + dx,
                                              max_dy=5.0, interpret=True))
        want = np.asarray(jax.vmap(bilinear_sample)(imgs, base_y + dy, base_x + dx))
        np.testing.assert_allclose(got, want, atol=6e-3)


class TestDcfFusedPallas:
    """Fused DCF gen+eval kernel (ops/pallas_dcf.py) vs the XLA scan
    formulation it replaces — must be bit-identical (same Threefry PRG,
    same seed layout), not just functionally equal."""

    def test_bit_identical_to_scan_path(self):
        import jax
        import jax.numpy as jnp
        from primia_tpu.mpc.dcf import dcf_eval, dcf_gen_from_seeds
        from primia_tpu.ops.pallas_dcf import dcf_sign_fused

        rng = np.random.default_rng(3)
        n = 300  # exercises padding to the 4096-element block
        seeds = jax.random.bits(jax.random.PRNGKey(7), (2, n, 4), jnp.uint32)
        alpha = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
        x = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2, n, dtype=np.uint32))
        beta = 1 - 2 * c.astype(jnp.int64)

        keys = dcf_gen_from_seeds(seeds, alpha, beta, n_bits=31)
        ref = jnp.stack([dcf_eval(0, keys, x, n_bits=31),
                         dcf_eval(1, keys, x, n_bits=31)])
        got = dcf_sign_fused(seeds, alpha, c, x, interpret=True)
        assert bool(jnp.all(got == ref))
        # and the reconstruction is the DCF contract itself
        tot = np.asarray(got[0] + got[1])
        expect = np.where(np.asarray(x) < np.asarray(alpha),
                          1 - 2 * np.asarray(c).astype(np.int64), 0)
        assert (tot == expect).all()

    def test_boundary_points(self):
        import jax
        import jax.numpy as jnp
        from primia_tpu.ops.pallas_dcf import dcf_sign_fused

        # x == alpha (strict <), x = 0, alpha = 0, max domain values
        alpha = jnp.asarray([5, 0, (1 << 31) - 1, 7, 7], jnp.uint32)
        x = jnp.asarray([5, 0, 0, 6, 8], jnp.uint32)
        c = jnp.zeros(5, jnp.uint32)
        seeds = jax.random.bits(jax.random.PRNGKey(1), (2, 5, 4), jnp.uint32)
        got = dcf_sign_fused(seeds, alpha, c, x, interpret=True)
        tot = np.asarray(got[0] + got[1])
        assert (tot == np.array([0, 0, 1, 1, 0])).all()


class TestWarpDenseTwopass:
    """Two-pass gather displacement warp (the default augmentation warp
    on TPU): exact for axis-aligned fields, field-resampled (documented
    approximation) for mixed smooth fields."""

    @staticmethod
    def _imgs(B=2, H=32, W=40, C=2, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))

    def test_identity_field_is_exact(self):
        from primia_tpu.ops.pallas_tent import warp_dense_twopass_pallas

        imgs = self._imgs()
        z = jnp.zeros(imgs.shape[:3], jnp.float32)
        got = np.asarray(warp_dense_twopass_pallas(imgs, z, z, interpret=True))
        np.testing.assert_allclose(got, np.asarray(imgs), atol=8e-3)  # bf16

    def test_axis_aligned_fields_match_dense(self):
        from primia_tpu.ops.image import bilinear_sample
        from primia_tpu.ops.pallas_tent import warp_dense_twopass_pallas

        imgs = self._imgs(seed=1)
        B, H, W, _ = imgs.shape
        key = jax.random.PRNGKey(3)
        dy = jax.random.uniform(key, (B, H, W), minval=-4.0, maxval=4.0)
        dx = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W),
                                minval=-4.0, maxval=4.0)
        rr = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[None]
        cc = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[None]
        z = jnp.zeros_like(dy)
        for dyy, dxx in ((dy, z), (z, dx)):  # dx==0, then dy==0
            got = np.asarray(
                warp_dense_twopass_pallas(imgs, dyy, dxx, interpret=True))
            want = np.asarray(jax.vmap(bilinear_sample)(
                imgs, rr + dyy, cc + dxx))
            np.testing.assert_allclose(got, want, atol=1.5e-2)

    def test_smooth_mixed_field_is_close(self):
        """Small-amplitude smooth field: the pre-warp-column sampling
        error is O(|dx| * Lip(dy)) — bounded and small here."""
        from primia_tpu.ops.image import bilinear_sample
        from primia_tpu.ops.pallas_tent import warp_dense_twopass_pallas

        B, H, W = 2, 32, 40
        rr = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        cc = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        # smooth image: the approximation is a ~0.5 px coordinate
        # perturbation, so measure it on a band-limited signal (on white
        # noise ANY sub-pixel shift yields O(1) value differences)
        imgs = jnp.stack([
            0.5 + 0.5 * jnp.sin(2 * np.pi * (cc / W + b * rr / H))
            for b in (1.0, 2.0)
        ])[..., None]
        dy = (1.5 * jnp.sin(2 * np.pi * cc / W) * jnp.ones((B, 1, 1)))
        dx = (1.5 * jnp.cos(2 * np.pi * rr / H) * jnp.ones((B, 1, 1)))
        got = np.asarray(
            warp_dense_twopass_pallas(imgs, dy, dx, interpret=True))
        want = np.asarray(jax.vmap(bilinear_sample)(
            imgs, rr[None] + dy, cc[None] + dx))
        # interior only (edge zero-fill composition differs by design)
        err = np.abs(got - want)[:, 4:-4, 4:-4]
        assert err.mean() < 0.02 and np.percentile(err, 99) < 0.15


class TestWgradPallas:
    """3x3/s1/p1 weight-grad kernel (ops/pallas_wgrad.py)."""

    def _ref_wgrad(self, x, g):
        import jax
        from primia_tpu.ops.pallas_wgrad import _conv_s1p1

        _, vjp = jax.vjp(
            lambda w_: _conv_s1p1(x.astype(jnp.float32), w_),
            jnp.zeros((3, 3, x.shape[-1], g.shape[-1]), jnp.float32))
        (dw,) = vjp(g.astype(jnp.float32))
        return dw

    def test_matches_xla_wgrad(self):
        from primia_tpu.ops.pallas_wgrad import conv3x3_wgrad_pallas

        rng = np.random.default_rng(0)
        for (B, H, W, ci, co) in [(4, 8, 8, 8, 16), (3, 9, 11, 8, 8),
                                  (2, 5, 7, 16, 8)]:
            x = jnp.asarray(rng.standard_normal((B, H, W, ci)), jnp.bfloat16)
            g = jnp.asarray(rng.standard_normal((B, H, W, co)), jnp.bfloat16)
            got = np.asarray(conv3x3_wgrad_pallas(x, g, interpret=True))
            want = np.asarray(self._ref_wgrad(x, g))
            np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())

    def test_v2_matches_xla_wgrad(self):
        """v2 schedule (VMEM halo shifts, no HBM pads) — same contract."""
        from primia_tpu.ops.pallas_wgrad import conv3x3_wgrad_pallas_v2

        rng = np.random.default_rng(2)
        for (B, H, W, ci, co) in [(4, 8, 8, 8, 16), (3, 9, 11, 8, 8),
                                  (2, 5, 7, 16, 8), (2, 14, 14, 32, 32)]:
            x = jnp.asarray(rng.standard_normal((B, H, W, ci)), jnp.bfloat16)
            g = jnp.asarray(rng.standard_normal((B, H, W, co)), jnp.bfloat16)
            got = np.asarray(conv3x3_wgrad_pallas_v2(x, g, interpret=True))
            want = np.asarray(self._ref_wgrad(x, g))
            np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())

    def test_custom_vjp_grads_match(self):
        """Full conv3x3_s1p1: dx and dw vs XLA's own conv grads."""
        import os
        from unittest import mock
        from primia_tpu.ops.pallas_wgrad import conv3x3_s1p1, _conv_s1p1

        rng = np.random.default_rng(1)
        B, H, W, ci, co = 2, 7, 9, 8, 16
        x = jnp.asarray(rng.standard_normal((B, H, W, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.bfloat16)

        def loss(fn, x_, w_):
            return jnp.sum(jnp.sin(fn(x_, w_).astype(jnp.float32)))

        # interpreter-mode Pallas for the CPU suite
        with mock.patch.dict(os.environ, {"PRIMIA_PALLAS_INTERPRET": "1"}):
            import primia_tpu.ops.pallas_wgrad as m

            orig = m.conv3x3_wgrad_pallas_v2  # _bwd routes C<=256 to v2
            with mock.patch.object(
                    m, "conv3x3_wgrad_pallas_v2",
                    lambda x_, g_: orig(x_, g_, interpret=True)):
                gx_p, gw_p = jax.grad(
                    lambda a, b: loss(conv3x3_s1p1, a, b), (0, 1))(x, w)
        gx_r, gw_r = jax.grad(
            lambda a, b: loss(_conv_s1p1, a, b), (0, 1))(x, w)
        np.testing.assert_allclose(
            np.asarray(gx_p, np.float32), np.asarray(gx_r, np.float32),
            atol=2e-2 * max(1e-9, np.abs(np.asarray(gx_r, np.float32)).max()))
        np.testing.assert_allclose(
            np.asarray(gw_p, np.float32), np.asarray(gw_r, np.float32),
            atol=2e-2 * max(1e-9, np.abs(np.asarray(gw_r, np.float32)).max()))


class TestBnPallas:
    """Train-mode BN reduction kernels (ops/pallas_bn.py)."""

    def _with_interpret(self):
        import os
        from unittest import mock

        return mock.patch.dict(os.environ, {"PRIMIA_PALLAS_INTERPRET": "1"})

    def test_channel_sums(self):
        from primia_tpu.ops.pallas_bn import channel_sums

        rng = np.random.default_rng(0)
        # (128, 4, 4, 8) exercises the batch-minor transpose-view path
        # (B >= 128, C < 128); the rest the row-major / folded paths
        for shape in [(4, 10, 10, 64), (2, 7, 7, 128), (5, 3, 3, 8),
                      (128, 4, 4, 8)]:
            x = jnp.asarray(rng.standard_normal(shape) * 2 + 1, jnp.bfloat16)
            with self._with_interpret():
                s1, s2 = channel_sums(x)
            xf = np.asarray(x, np.float32).reshape(-1, shape[-1])
            np.testing.assert_allclose(np.asarray(s1), xf.sum(0), rtol=2e-3,
                                       atol=5e-2)
            np.testing.assert_allclose(np.asarray(s2), (xf * xf).sum(0),
                                       rtol=2e-3, atol=5e-2)

    def test_grad_channel_sums_batch_minor(self):
        from primia_tpu.ops.pallas_bn import grad_channel_sums

        rng = np.random.default_rng(2)
        B, H, W, C = 130, 3, 5, 16  # odd B: partial lane tile
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        with self._with_interpret():
            s1, s2 = grad_channel_sums(g, x)
        gf = np.asarray(g, np.float32).reshape(-1, C)
        xf = np.asarray(x, np.float32).reshape(-1, C)
        np.testing.assert_allclose(np.asarray(s1), gf.sum(0), rtol=2e-3,
                                   atol=5e-2)
        np.testing.assert_allclose(np.asarray(s2), (gf * xf).sum(0),
                                   rtol=2e-3, atol=5e-2)

    def test_bn_train_forward_and_grads(self):
        from primia_tpu.ops.pallas_bn import bn_train

        rng = np.random.default_rng(1)
        B, H, W, C = 3, 6, 5, 16
        x = jnp.asarray(rng.standard_normal((B, H, W, C)) + 0.5, jnp.bfloat16)
        gamma = jnp.asarray(rng.standard_normal(C) * 0.3 + 1, jnp.bfloat16)
        beta = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.bfloat16)
        gout = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

        def ref(x_, ga, be):
            xf = x_.astype(jnp.float32)
            mean = jnp.mean(xf, (0, 1, 2))
            var = jnp.maximum(jnp.mean(xf * xf, (0, 1, 2)) - mean ** 2, 0.0)
            inv = ga.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5)
            return xf * inv + (be.astype(jnp.float32) - mean * inv), mean, var

        with self._with_interpret():
            y_p, m_p, v_p = bn_train(x, gamma, beta)
        y_r, m_r, v_r = ref(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(y_p, np.float32),
                                   np.asarray(y_r), atol=0.05)

        def loss_p(x_, ga, be):
            return jnp.sum(bn_train(x_, ga, be)[0].astype(jnp.float32)
                           * gout.astype(jnp.float32))

        def loss_r(x_, ga, be):
            return jnp.sum(ref(x_, ga, be)[0] * gout.astype(jnp.float32))

        with self._with_interpret():
            gp = jax.grad(loss_p, (0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_r, (0, 1, 2))(x, gamma, beta)
        for a, b in zip(gp, gr):
            bf = np.asarray(b, np.float32)
            np.testing.assert_allclose(np.asarray(a, np.float32), bf,
                                       atol=2e-2 * max(1e-9, np.abs(bf).max()))
