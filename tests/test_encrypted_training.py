"""Encrypted training: share-space autograd vs plaintext jax.grad.

Reference component: AutogradTensor
(``syft/.../interpreters/autograd.py``) — gradients computed without
ever revealing data, activations, weights, or gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.mpc import autograd as ag
from primia_tpu.mpc import fixed
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.engine import MpcContext, encode_and_share, reveal_and_decode


def _share_tree(key, tree):
    return encode_and_share(key, tree)


def _reveal(x):
    return np.asarray(reveal_and_decode(x))


# ---------------------------------------------------------------- MLP

def _mlp_forward_enc(ctx, p, x_share, y_share):
    h = ag.linear(ctx, ag.Var(x_share), p["w1"], p["b1"])
    h = ag.relu(ctx, h)
    out = ag.linear(ctx, h, p["w2"], p["b2"])
    return ag.mse_loss(ctx, out, y_share)


def _mlp_forward_plain(p, x, y):
    h = jax.nn.relu(x @ p["w1"] + p["b1"])
    out = h @ p["w2"] + p["b2"]
    return jnp.mean((out - y) ** 2)


@pytest.fixture(scope="module")
def mlp_problem():
    rng = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.5, (4, 8))),
        "b1": jnp.asarray(rng.normal(0, 0.1, (8,))),
        "w2": jnp.asarray(rng.normal(0, 0.5, (8, 3))),
        "b2": jnp.asarray(rng.normal(0, 0.1, (3,))),
    }
    x = jnp.asarray(rng.normal(0, 1, (6, 4)))
    y = jnp.asarray(rng.normal(0, 1, (6, 3)))
    return params, x, y


class TestMLPGradients:
    def test_loss_and_grads_match_plaintext(self, mlp_problem):
        params, x, y = mlp_problem
        key = jax.random.PRNGKey(1)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ctx = MpcContext(k1)
        ps = _share_tree(k2, params)
        xs = S.share(k3, fixed.encode(x))
        ys = S.share(k4, fixed.encode(y))

        loss_share, grads = ag.value_and_grad(_mlp_forward_enc)(ctx, ps, xs, ys)
        ref_loss, ref_grads = jax.value_and_grad(_mlp_forward_plain)(params, x, y)

        assert abs(float(_reveal(loss_share)) - float(ref_loss)) < 5e-3
        for k in params:
            np.testing.assert_allclose(
                _reveal(grads[k]), np.asarray(ref_grads[k]), atol=5e-3,
                err_msg=f"grad mismatch for {k}")

    def test_nothing_revealed_is_garbage_without_both_shares(self, mlp_problem):
        """A single party's gradient share is uniform-looking, not the
        gradient (secrecy of the training path)."""
        params, x, y = mlp_problem
        key = jax.random.PRNGKey(2)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ctx = MpcContext(k1)
        ps = _share_tree(k2, params)
        xs = S.share(k3, fixed.encode(x))
        ys = S.share(k4, fixed.encode(y))
        _, grads = ag.value_and_grad(_mlp_forward_enc)(ctx, ps, xs, ys)
        one_party = np.asarray(grads["w1"].data[0], np.float64)
        true_grad = _reveal(grads["w1"]) * (1 << 16)
        assert not np.allclose(one_party, true_grad, atol=1e3)

    def test_sgd_trains_encrypted(self, mlp_problem):
        params, x, y = mlp_problem
        key = jax.random.PRNGKey(3)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ctx = MpcContext(k1)
        ps = _share_tree(k2, params)
        xs = S.share(k3, fixed.encode(x))
        ys = S.share(k4, fixed.encode(y))
        vag = ag.value_and_grad(_mlp_forward_enc)
        losses = []
        for _ in range(15):
            loss_share, grads = vag(ctx, ps, xs, ys)
            losses.append(float(_reveal(loss_share)))
            ps = {k: ag.sgd_update(v, grads[k], lr=0.05) for k, v in ps.items()}
        assert losses[-1] < 0.5 * losses[0], losses

    def test_encrypted_matches_plaintext_training(self, mlp_problem):
        """Same init, same data: N encrypted SGD steps land within
        fixed-point tolerance of N plaintext steps."""
        params, x, y = mlp_problem
        key = jax.random.PRNGKey(4)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ctx = MpcContext(k1)
        ps = _share_tree(k2, params)
        xs = S.share(k3, fixed.encode(x))
        ys = S.share(k4, fixed.encode(y))
        pp = dict(params)
        vag = ag.value_and_grad(_mlp_forward_enc)
        gfn = jax.grad(_mlp_forward_plain)
        for _ in range(5):
            _, grads = vag(ctx, ps, xs, ys)
            ps = {k: ag.sgd_update(v, grads[k], lr=0.1) for k, v in ps.items()}
            pg = gfn(pp, x, y)
            pp = {k: v - 0.1 * pg[k] for k, v in pp.items()}
        for k in params:
            np.testing.assert_allclose(_reveal(ps[k]), np.asarray(pp[k]),
                                       atol=5e-3, err_msg=k)

    def test_whole_step_jits(self, mlp_problem):
        params, x, y = mlp_problem
        vag = ag.value_and_grad(_mlp_forward_enc)

        @jax.jit
        def step(key, params_f, x, y):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            ctx = MpcContext(k1)
            ps = _share_tree(k2, params_f)
            xs = S.share(k3, fixed.encode(x))
            ys = S.share(k4, fixed.encode(y))
            loss_share, grads = vag(ctx, ps, xs, ys)
            new = {k: ag.sgd_update(v, grads[k], lr=0.1) for k, v in ps.items()}
            return (S.reconstruct(loss_share),
                    {k: S.reconstruct(v) for k, v in new.items()})

        loss, new = step(jax.random.PRNGKey(5), params, x, y)
        assert np.isfinite(float(fixed.decode(loss)))
        assert new["w1"].shape == (4, 8)


# ---------------------------------------------------------------- conv

def _conv_forward_enc(ctx, p, x_share, y_share, stride):
    h = ag.conv2d(ctx, ag.Var(x_share), p["w"], stride=stride, padding=1)
    h = ag.bias_add(h, p["cb"])
    h = ag.relu(ctx, h)
    h = ag.avg_pool(ctx, h, 2)
    h = ag.flatten(h)
    out = ag.linear(ctx, h, p["wf"], p["bf"])
    return ag.mse_loss(ctx, out, y_share)


def _conv_forward_plain(p, x, y, stride):
    h = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["cb"]
    h = jax.nn.relu(h)
    B, H, W, C = h.shape
    h = h.reshape(B, H // 2, 2, W // 2, 2, C).mean((2, 4))
    out = h.reshape(B, -1) @ p["wf"] + p["bf"]
    return jnp.mean((out - y) ** 2)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_gradients_match_plaintext(stride):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 1)))
    ho = (8 + 2 - 3) // stride + 1  # conv out, then /2 pool
    feat = (ho // 2) ** 2 * 2
    params = {
        "w": jnp.asarray(rng.normal(0, 0.4, (3, 3, 1, 2))),
        "cb": jnp.asarray(rng.normal(0, 0.1, (2,))),
        "wf": jnp.asarray(rng.normal(0, 0.4, (feat, 3))),
        "bf": jnp.asarray(rng.normal(0, 0.1, (3,))),
    }
    y = jnp.asarray(rng.normal(0, 1, (2, 3)))

    key = jax.random.PRNGKey(6)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ctx = MpcContext(k1)
    ps = _share_tree(k2, params)
    xs = S.share(k3, fixed.encode(x))
    ys = S.share(k4, fixed.encode(y))

    loss_share, grads = ag.value_and_grad(
        lambda c, p, a, b: _conv_forward_enc(c, p, a, b, stride))(ctx, ps, xs, ys)
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: _conv_forward_plain(p, x, y, stride))(params)

    assert abs(float(_reveal(loss_share)) - float(ref_loss)) < 1e-2
    for k in params:
        np.testing.assert_allclose(
            _reveal(grads[k]), np.asarray(ref_grads[k]), atol=1e-2,
            err_msg=f"grad mismatch for {k} (stride {stride})")


def test_elementwise_mul_add_sub_grads():
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    ctx = MpcContext(k1)
    xv, yv = jnp.asarray([1.5, -2.0, 0.5]), jnp.asarray([3.0, 1.0, -4.0])
    x = ag.Var(S.share(k2, fixed.encode(xv)))
    y = ag.Var(S.share(k3, fixed.encode(yv)))
    z = ag.sub(ag.add(ag.mul(ctx, x, y), x), y)  # x*y + x - y
    ones = S.share(ctx.next_key(), fixed.encode(jnp.ones(3)))
    grads = ag.backward(z, ones)
    np.testing.assert_allclose(_reveal(grads[id(x)]), yv + 1, atol=1e-3)
    np.testing.assert_allclose(_reveal(grads[id(y)]), xv - 1, atol=1e-3)
