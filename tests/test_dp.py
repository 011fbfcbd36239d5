"""DP-SGD step correctness: per-example clipping math, tail handling,
noise scaling, and RDP accounting.

Reference contract: ``train.py:326-334`` (torchdp PrivacyEngine with
noise_multiplier=1.3, max_grad_norm=1.0 attached to the optimizer);
torchdp semantics: clip each per-example grad to max_grad_norm, sum,
add N(0, sigma^2 I), divide by batch size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.train import losses
from primia_tpu.train.dp import build_dp_train_step, rdp_epsilon
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState


def _setup(B=10, noise=0.0, clip=1.0):
    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, batch_size=B, optimizer="SGD",
                     differentially_private=True, noise_multiplier=noise,
                     max_grad_norm=clip)
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    opt = make_optimizer(args)
    ts = TrainState(params, state, opt.init(params))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (B, 28, 28, 1), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 3, B, dtype=np.int32))
    mask = jnp.ones(B, jnp.float32)
    return args, md, opt, ts, imgs, labels, mask


def _manual_dp_grads(md, args, ts, x, labels, clip):
    """Reference math: per-example grad, clip to ``clip``, sum, /B."""
    def ex_loss(p, xi, yi):
        logits, _ = md.forward(p, ts.model_state, xi[None], train=False)
        return losses.cross_entropy(logits.astype(jnp.float32), yi[None])

    gs = jax.vmap(jax.grad(ex_loss), in_axes=(None, 0, 0))(ts.params, x, labels)
    sq = sum(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1)
             for g in jax.tree.leaves(gs))
    factor = jnp.minimum(1.0, clip / jnp.sqrt(sq + 1e-12))
    B = x.shape[0]
    return jax.tree.map(lambda g: jnp.tensordot(factor, g, axes=1) / B, gs)


class TestDpStep:
    def test_matches_manual_clipped_average(self):
        """sigma=0: the DP step's parameter update equals SGD on the
        manually clipped-and-averaged per-example gradients."""
        args, md, opt, ts, imgs, labels, mask = _setup(B=6, noise=0.0, clip=0.05)
        # bypass augmentation randomness: feed the augmented pixels
        # through the same path by zeroing all augment toggles (default
        # Arguments has none set) — augment reduces to crop+normalize
        step = build_dp_train_step(md, opt, args, np.array([0.5]),
                                   np.array([0.25]), microbatch=3, donate=False)
        lr = 0.1
        ts2, loss = step(ts, jax.random.PRNGKey(1), imgs, labels, mask, lr)

        from primia_tpu.ops.augment import AugmentConfig, build_augment_fn
        x = build_augment_fn(AugmentConfig.from_args(args),
                             np.array([0.5]), np.array([0.25]), 1)(
            jax.random.split(jax.random.PRNGKey(1))[0], imgs)
        want = _manual_dp_grads(md, args, ts, x, labels, clip=0.05)
        for p0, p1, g in zip(jax.tree.leaves(ts.params),
                             jax.tree.leaves(ts2.params),
                             jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p0) - lr * np.asarray(g),
                rtol=2e-2, atol=2e-4)

    def test_tail_examples_not_dropped(self):
        """B=10 with microbatch 4 must give the same update as
        microbatch 10 (regression: the old chunking silently truncated
        the tail examples)."""
        args, md, opt, ts, imgs, labels, mask = _setup(B=10, noise=0.0)
        s_a = build_dp_train_step(md, opt, args, np.array([0.5]),
                                  np.array([0.25]), microbatch=4, donate=False)
        s_b = build_dp_train_step(md, opt, args, np.array([0.5]),
                                  np.array([0.25]), microbatch=10, donate=False)
        ts_a, loss_a = s_a(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        ts_b, loss_b = s_b(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ts_a.params),
                        jax.tree.leaves(ts_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_masked_rows_contribute_nothing(self):
        args, md, opt, ts, imgs, labels, mask = _setup(B=8, noise=0.0)
        step = build_dp_train_step(md, opt, args, np.array([0.5]),
                                   np.array([0.25]), microbatch=4, donate=False)
        m = mask.at[6:].set(0.0)
        ts_m, _ = step(ts, jax.random.PRNGKey(3), imgs, labels, m, 0.05)
        # corrupt the masked rows: result must be identical
        imgs2 = imgs.at[6:].set(255 - imgs[6:])
        ts_c, _ = step(ts, jax.random.PRNGKey(3), imgs2, labels, m, 0.05)
        for a, b in zip(jax.tree.leaves(ts_m.params),
                        jax.tree.leaves(ts_c.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_noise_scales_with_sigma(self):
        """Same key, sigma 0 vs large: update difference reflects the
        injected Gaussian (std = sigma*clip/B on the averaged grad)."""
        args, md, opt, ts, imgs, labels, mask = _setup(B=8, noise=0.0)
        argsN = Arguments(**{**args.to_dict(), "noise_multiplier": 5.0})
        s0 = build_dp_train_step(md, opt, args, np.array([0.5]),
                                 np.array([0.25]), microbatch=8, donate=False)
        sN = build_dp_train_step(md, opt, argsN, np.array([0.5]),
                                 np.array([0.25]), microbatch=8, donate=False)
        t0, _ = s0(ts, jax.random.PRNGKey(4), imgs, labels, mask, 1.0)
        tN, _ = sN(ts, jax.random.PRNGKey(4), imgs, labels, mask, 1.0)
        diffs = np.concatenate([
            (np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(t0.params),
                            jax.tree.leaves(tN.params))])
        expected_std = 5.0 * 1.0 / 8.0  # sigma*clip/B
        assert 0.5 * expected_std < diffs.std() < 1.5 * expected_std

    def test_bf16_compute_dtype_runs(self):
        """Regression: the BN eval branch (nn/core.py) must keep the
        activation dtype — f32 running stats used to promote a bfloat16
        per-example forward to f32 and the next conv raised a mixed-dtype
        TypeError, so the DP step could not trace on TPU at all."""
        args = Arguments(model="resnet-18", train_resolution=32,
                         inference_resolution=32, batch_size=4,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=1.0,
                         compute_dtype="bfloat16")
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4, dtype=np.int32))
        step = build_dp_train_step(md, opt, args, np.array([0.5]),
                                   np.array([0.25]), microbatch=2)
        ts2, loss = step(ts, jax.random.PRNGKey(1), imgs, labels,
                         jnp.ones(4, jnp.float32), 1e-3)
        assert np.isfinite(float(loss))


class TestAugmentMultiplicity:
    def test_mean_over_views_then_clip(self):
        """augment_multiplicity=K: each example's gradient is the mean
        over K augmented views, THEN clipped (De et al. 2022) — must
        match the manual formulation exactly."""
        from primia_tpu.ops.augment import AugmentConfig, build_augment_fn

        B, K, clip = 5, 3, 0.05
        args = Arguments(model="simpleconv", train_resolution=28,
                         inference_resolution=28, batch_size=B,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=clip,
                         augment_multiplicity=K, rotation=15.0, scale=0.1,
                         noise_std=0.05, noise_prob=1.0)
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.integers(0, 255, (B, 28, 28, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, B, dtype=np.int32))
        mask = jnp.ones(B, jnp.float32)

        from primia_tpu.train.dp import select_train_step

        mean, std = np.array([0.5]), np.array([0.25])
        step = select_train_step(md, opt, args, mean, std, donate=False)
        lr = 0.1
        ts2, _ = step(ts, jax.random.PRNGKey(7), imgs, labels, mask, lr)

        # manual: same augment keys -> K views; per-example mean grad
        # over views; clip; sum; /B
        k_aug, _ = jax.random.split(jax.random.PRNGKey(7))
        aug = build_augment_fn(AugmentConfig.from_args(args), mean, std, 1)
        views = jnp.stack([aug(kk, imgs) for kk in jax.random.split(k_aug, K)])

        def ex_loss(p, xkv, yi):  # xkv: (K,H,W,C)
            logits, _ = md.forward(p, ts.model_state, xkv, train=False)
            return losses.cross_entropy(logits.astype(jnp.float32),
                                        jnp.broadcast_to(yi, (K,)))

        gs = jax.vmap(jax.grad(ex_loss), in_axes=(None, 1, 0))(
            ts.params, views, labels)
        sq = sum(jnp.sum(g.reshape(B, -1) ** 2, axis=1)
                 for g in jax.tree.leaves(gs))
        factor = jnp.minimum(1.0, clip / jnp.sqrt(sq + 1e-12))
        want = jax.tree.map(
            lambda g: jnp.tensordot(factor, g, axes=1) / B, gs)
        for p0, p1, g in zip(jax.tree.leaves(ts.params),
                             jax.tree.leaves(ts2.params),
                             jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p0) - lr * np.asarray(g),
                rtol=2e-2, atol=2e-4)


class TestGhostDpStep:
    """Ghost-norm clipping (no per-example grads materialized) must be
    a drop-in for the microbatched path: same clipping math, same
    noise/mask/tail semantics."""

    def test_matches_manual_clipped_average(self):
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args, md, opt, ts, imgs, labels, mask = _setup(B=6, noise=0.0, clip=0.05)
        step = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                         np.array([0.25]), donate=False)
        lr = 0.1
        ts2, loss = step(ts, jax.random.PRNGKey(1), imgs, labels, mask, lr)

        from primia_tpu.ops.augment import AugmentConfig, build_augment_fn
        x = build_augment_fn(AugmentConfig.from_args(args),
                             np.array([0.5]), np.array([0.25]), 1)(
            jax.random.split(jax.random.PRNGKey(1))[0], imgs)
        want = _manual_dp_grads(md, args, ts, x, labels, clip=0.05)
        for p0, p1, g in zip(jax.tree.leaves(ts.params),
                             jax.tree.leaves(ts2.params),
                             jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p0) - lr * np.asarray(g),
                rtol=2e-2, atol=2e-4)

    def test_matches_microbatch_path(self):
        """Ghost and microbatched steps agree leaf-for-leaf at sigma=0
        (both compute sum_i min(1, C/||g_i||) g_i / B exactly)."""
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args, md, opt, ts, imgs, labels, mask = _setup(B=8, noise=0.0, clip=0.1)
        sg = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                       np.array([0.25]), donate=False)
        sm = build_dp_train_step(md, opt, args, np.array([0.5]),
                                 np.array([0.25]), microbatch=4, donate=False)
        tg, lg = sg(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        tm, lm = sm(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        np.testing.assert_allclose(float(lg), float(lm), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(tg.params), jax.tree.leaves(tm.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_masked_rows_contribute_nothing(self):
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args, md, opt, ts, imgs, labels, mask = _setup(B=8, noise=0.0)
        step = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                         np.array([0.25]), donate=False)
        m = mask.at[6:].set(0.0)
        ts_m, _ = step(ts, jax.random.PRNGKey(3), imgs, labels, m, 0.05)
        imgs2 = imgs.at[6:].set(255 - imgs[6:])
        ts_c, _ = step(ts, jax.random.PRNGKey(3), imgs2, labels, m, 0.05)
        for a, b in zip(jax.tree.leaves(ts_m.params),
                        jax.tree.leaves(ts_c.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_resnet_bn_layers_clip_correctly(self):
        """ResNet-18 exercises the conv-ghost decision, strided convs,
        BN gamma/beta chaining, and the fc layer; the ghost update must
        match the manual per-example formulation."""
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args = Arguments(model="resnet-18", train_resolution=32,
                         inference_resolution=32, batch_size=4,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=0.05)
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4, dtype=np.int32))
        mask = jnp.ones(4, jnp.float32)

        step = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                         np.array([0.25]), donate=False)
        lr = 0.1
        ts2, _ = step(ts, jax.random.PRNGKey(1), imgs, labels, mask, lr)

        from primia_tpu.ops.augment import AugmentConfig, build_augment_fn
        x = build_augment_fn(AugmentConfig.from_args(args),
                             np.array([0.5]), np.array([0.25]), 1)(
            jax.random.split(jax.random.PRNGKey(1))[0], imgs)
        want = _manual_dp_grads(md, args, ts, x, labels, clip=0.05)
        for p0, p1, g in zip(jax.tree.leaves(ts.params),
                             jax.tree.leaves(ts2.params),
                             jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p0) - lr * np.asarray(g),
                rtol=2e-2, atol=2e-4)

    def test_resnet_groupnorm_ghost_matches_manual(self):
        """normalization=group (the DP-trainable variant — frozen-at-init
        BN collapses from-scratch DP training, measured round 5): the
        GN affine rides the engine's plain-affine record, so the ghost
        update must match the exact per-example formulation."""
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args = Arguments(model="resnet-18", train_resolution=32,
                         inference_resolution=32, batch_size=4,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=0.05,
                         normalization="group")
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(8)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4, dtype=np.int32))
        mask = jnp.ones(4, jnp.float32)

        step = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                         np.array([0.25]), donate=False)
        lr = 0.1
        ts2, _ = step(ts, jax.random.PRNGKey(1), imgs, labels, mask, lr)

        from primia_tpu.ops.augment import AugmentConfig, build_augment_fn
        x = build_augment_fn(AugmentConfig.from_args(args),
                             np.array([0.5]), np.array([0.25]), 1)(
            jax.random.split(jax.random.PRNGKey(1))[0], imgs)
        want = _manual_dp_grads(md, args, ts, x, labels, clip=0.05)
        for p0, p1, g in zip(jax.tree.leaves(ts.params),
                             jax.tree.leaves(ts2.params),
                             jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p0) - lr * np.asarray(g),
                rtol=2e-2, atol=2e-4)

    def test_stem_norm_path_matches_microbatch(self):
        """At >=46 px even inputs the 7x7/s2/p3 stem's output T exceeds
        256, so the per-example norm takes the ``_stem_sq_norms``
        space-to-depth branch instead of the T^2 gram (regression: a
        rank-4 einsum subscript on the rank-3 patch buffer crashed any
        canonical-resolution ghost-DP step; the 32-px tests never
        reached the branch). 64 px: stem T = 1024."""
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args = Arguments(model="resnet-18", train_resolution=64,
                         inference_resolution=64, batch_size=4,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=0.05)
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4, dtype=np.int32))
        mask = jnp.ones(4, jnp.float32)

        sg = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                       np.array([0.25]), donate=False)
        sm = build_dp_train_step(md, opt, args, np.array([0.5]),
                                 np.array([0.25]), microbatch=2, donate=False)
        tg, lg = sg(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        tm, lm = sm(ts, jax.random.PRNGKey(2), imgs, labels, mask, 0.05)
        np.testing.assert_allclose(float(lg), float(lm), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(tg.params), jax.tree.leaves(tm.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_bf16_compute_dtype_runs(self):
        from primia_tpu.train.dp import build_ghost_dp_train_step

        args = Arguments(model="resnet-18", train_resolution=32,
                         inference_resolution=32, batch_size=4,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.0, max_grad_norm=1.0,
                         compute_dtype="bfloat16")
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 1), dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4, dtype=np.int32))
        step = build_ghost_dp_train_step(md, opt, args, np.array([0.5]),
                                         np.array([0.25]))
        ts2, loss = step(ts, jax.random.PRNGKey(1), imgs, labels,
                         jnp.ones(4, jnp.float32), 1e-3)
        assert np.isfinite(float(loss))


class TestRdpAccounting:
    def test_epsilon_grows_with_steps(self):
        e1, _ = rdp_epsilon(noise_multiplier=1.3, sample_rate=0.04, steps=100)
        e2, _ = rdp_epsilon(noise_multiplier=1.3, sample_rate=0.04, steps=1000)
        assert 0 < e1 < e2

    def test_epsilon_shrinks_with_noise(self):
        lo, _ = rdp_epsilon(noise_multiplier=2.0, sample_rate=0.04, steps=500)
        hi, _ = rdp_epsilon(noise_multiplier=0.8, sample_rate=0.04, steps=500)
        assert lo < hi

    def test_full_batch_matches_gaussian(self):
        """sample_rate=1 must reduce to the plain Gaussian mechanism
        RDP alpha/(2 sigma^2)."""
        from primia_tpu.train.dp import rdp_sampled_gaussian

        assert rdp_sampled_gaussian(1.0, 2.0, 8) == pytest.approx(8 / (2 * 4.0))


class TestFederatedDp:
    """DP x federated composition (parity-plus: the reference hard-exits
    on --train_federated + DP, train.py:310). The node-axis vmap must
    apply the exact same per-node DP mechanism as running the step on
    each node sequentially."""

    @pytest.mark.parametrize("ghost", [True, False])
    def test_vmapped_step_matches_sequential(self, monkeypatch, ghost):
        monkeypatch.setenv("PRIMIA_DP_GHOST", "1" if ghost else "0")
        from primia_tpu.train.dp import select_train_step
        from primia_tpu.train.optim import make_optimizer

        B, n_nodes = 6, 2
        args = Arguments(model="simpleconv", train_resolution=28,
                         inference_resolution=28, batch_size=B,
                         optimizer="SGD", differentially_private=True,
                         noise_multiplier=0.7, max_grad_norm=1.0)
        md = create_model(args, num_classes=3)
        params, state = md.init(jax.random.PRNGKey(0))
        opt = make_optimizer(args)
        raw = select_train_step(md, opt, args, np.array([0.5]),
                                np.array([0.25]), donate=False,
                                jit_compile=False)
        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.integers(0, 255, (n_nodes, B, 28, 28, 1),
                                        dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, (n_nodes, B), np.int64)
                             .astype(np.int32))
        # heterogeneous masks: node 1's final two rows are padding
        mask = jnp.asarray(np.stack([np.ones(B), [1, 1, 1, 1, 0, 0]])
                           .astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(5), n_nodes)

        stacked = jax.tree.map(
            lambda a: jnp.stack([a] * n_nodes),
            TrainState(params, state, opt.init(params)))
        fed = jax.jit(jax.vmap(raw, in_axes=(0, 0, 0, 0, 0, None)))
        fed_ts, fed_loss = fed(stacked, keys, imgs, labels, mask, 0.05)

        seq = jax.jit(raw)
        for i in range(n_nodes):
            ts_i, loss_i = seq(TrainState(params, state, opt.init(params)),
                               keys[i], imgs[i], labels[i], mask[i], 0.05)
            np.testing.assert_allclose(float(fed_loss[i]), float(loss_i),
                                       rtol=1e-5)
            for a, b in zip(jax.tree.leaves(fed_ts.params),
                            jax.tree.leaves(ts_i.params)):
                np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                           rtol=2e-4, atol=2e-5)

    def test_select_train_step_dispatch(self, monkeypatch):
        from primia_tpu.train import dp as dp_mod
        from primia_tpu.train.optim import make_optimizer

        args = Arguments(model="simpleconv", train_resolution=28,
                         inference_resolution=28, batch_size=4,
                         optimizer="SGD", differentially_private=False)
        md = create_model(args, num_classes=3)
        opt = make_optimizer(args)
        # plain config -> plain step (smoke: runs and returns finite loss)
        step = dp_mod.select_train_step(md, opt, args, np.array([0.5]),
                                        np.array([0.25]), donate=False)
        params, state = md.init(jax.random.PRNGKey(0))
        ts = TrainState(params, state, opt.init(params))
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 28, 28, 1), np.uint8))
        labels = jnp.asarray(rng.integers(0, 3, 4).astype(np.int32))
        _, loss = step(ts, jax.random.PRNGKey(1), imgs, labels,
                       jnp.ones(4, jnp.float32), 0.05)
        assert np.isfinite(float(loss))
