"""MPC engine tests: codec, sharing, Beaver, FSS, share-space NN ops,
and end-to-end encrypted inference parity with plaintext."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.mpc import beaver, compare, fixed
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.dcf import dcf_eval, dcf_gen, dpf_eval, dpf_gen
from primia_tpu.mpc.engine import (
    MpcContext,
    MpcEngine,
    encode_and_share,
    reveal_and_decode,
)
from primia_tpu.mpc.prg import threefry2x32

KEY = jax.random.PRNGKey(7)


# ------------------------------------------------------------------ codec

def test_fixed_roundtrip():
    x = jnp.array([0.0, 1.5, -2.25, 1000.125, -0.0001], jnp.float64)
    v = fixed.encode(x)
    back = fixed.decode(v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2 ** -16)


def test_truncate_shares_error_bound():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1000, 1000, 256)
    v = fixed.encode(jnp.asarray(x))
    prod = v * fixed.encode(jnp.ones_like(jnp.asarray(x)))  # scale 2f
    sh = S.share(KEY, prod)
    tr = fixed.truncate_shares(sh.data)
    got = fixed.decode(jnp.sum(tr, 0))
    np.testing.assert_allclose(np.asarray(got), x, atol=3 * 2 ** -16)


# ---------------------------------------------------------------- sharing

def test_share_reconstruct():
    v = fixed.encode(jnp.array([1.0, -3.5, 7.25]))
    sh = S.share(KEY, v)
    assert sh.data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(S.reconstruct(sh)), np.asarray(v))
    # individual shares look uniform, not like the value
    assert not np.array_equal(np.asarray(sh.data[0]), np.asarray(v))


def test_share_linear_ops():
    a = fixed.encode(jnp.array([1.0, 2.0]))
    b = fixed.encode(jnp.array([10.0, -4.0]))
    sa, sb = S.share(KEY, a), S.share(jax.random.fold_in(KEY, 1), b)
    np.testing.assert_array_equal(S.reconstruct(S.add(sa, sb)), a + b)
    np.testing.assert_array_equal(S.reconstruct(S.sub(sa, sb)), a - b)
    np.testing.assert_array_equal(
        S.reconstruct(S.add_public(sa, fixed.encode(5.0))),
        a + fixed.encode(5.0),
    )
    np.testing.assert_array_equal(S.reconstruct(S.mul_public(sa, 3)), a * 3)


# ----------------------------------------------------------------- beaver

def test_beaver_mul():
    x = jnp.array([1.5, -2.0, 0.25])
    y = jnp.array([4.0, 3.0, -8.0])
    sx = S.share(KEY, fixed.encode(x))
    sy = S.share(jax.random.fold_in(KEY, 1), fixed.encode(y))
    z = beaver.mul(jax.random.fold_in(KEY, 2), sx, sy)
    got = fixed.decode(S.reconstruct(AS(z)), 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * y), atol=1e-4)


def AS(x):
    return x


def test_beaver_matmul_and_truncate():
    rng = np.random.default_rng(1)
    x = rng.uniform(-2, 2, (4, 6))
    y = rng.uniform(-2, 2, (6, 3))
    sx = S.share(KEY, fixed.encode(jnp.asarray(x)))
    sy = S.share(jax.random.fold_in(KEY, 1), fixed.encode(jnp.asarray(y)))
    z = beaver.matmul(jax.random.fold_in(KEY, 2), sx, sy)
    z = S.AShare(fixed.truncate_shares(z.data))
    got = np.asarray(fixed.decode(S.reconstruct(z)))
    np.testing.assert_allclose(got, x @ y, atol=1e-3)


def test_beaver_conv2d():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 6, 6, 2))
    w = rng.uniform(-1, 1, (3, 3, 2, 4))
    sx = S.share(KEY, fixed.encode(jnp.asarray(x)))
    sw = S.share(jax.random.fold_in(KEY, 1), fixed.encode(jnp.asarray(w)))
    z = beaver.conv2d(jax.random.fold_in(KEY, 2), sx, sw, stride=1, padding=1)
    z = S.AShare(fixed.truncate_shares(z.data))
    got = np.asarray(fixed.decode(S.reconstruct(z)))
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


# -------------------------------------------------------------------- prg

def test_threefry_reference_vector():
    """Known-answer test: Threefry-2x32, 20 rounds, key (0,0), ctr (0,0)
    (Random123 reference output)."""
    x0, x1 = threefry2x32(
        jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)
    )
    assert (int(x0), int(x1)) == (0x6B200159, 0x99BA4EFE)


# -------------------------------------------------------------------- fss

@pytest.mark.parametrize("n_bits", [6])
def test_dcf_exhaustive(n_bits):
    D = 1 << n_bits
    alphas = jnp.arange(D, dtype=jnp.uint32)
    betas = jnp.full((D,), 3, jnp.int64)
    k = dcf_gen(KEY, alphas, betas, n_bits=n_bits)

    @jax.jit
    def eval_both(xs):
        return dcf_eval(0, k, xs, n_bits=n_bits) + dcf_eval(1, k, xs, n_bits=n_bits)

    # all (x, alpha) pairs at once: vmap over the x axis
    xs_all = jnp.broadcast_to(jnp.arange(D, dtype=jnp.uint32)[:, None], (D, D))
    got = np.asarray(jax.vmap(eval_both)(xs_all))
    want = (np.arange(D)[:, None] < np.arange(D)[None, :]) * 3
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_bits", [6])
def test_dpf_exhaustive(n_bits):
    D = 1 << n_bits
    alphas = jnp.arange(D, dtype=jnp.uint32)
    betas = jnp.full((D,), 5, jnp.int64)
    k = dpf_gen(KEY, alphas, betas, n_bits=n_bits)

    @jax.jit
    def eval_both(xs):
        return dpf_eval(0, k, xs, n_bits=n_bits) + dpf_eval(1, k, xs, n_bits=n_bits)

    xs_all = jnp.broadcast_to(jnp.arange(D, dtype=jnp.uint32)[:, None], (D, D))
    got = np.asarray(jax.vmap(eval_both)(xs_all))
    want = (np.arange(D)[:, None] == np.arange(D)[None, :]) * 5
    np.testing.assert_array_equal(got, want)


def test_dcf_full_domain_32bit():
    """Random spot-checks on the production 32-bit domain."""
    rng = np.random.default_rng(3)
    alphas = jnp.asarray(rng.integers(0, 2 ** 32, 64), jnp.uint32)
    betas = jnp.ones((64,), jnp.int64)
    k = dcf_gen(KEY, alphas, betas)
    xs = jnp.asarray(rng.integers(0, 2 ** 32, 64), jnp.uint32)
    got = np.asarray(dcf_eval(0, k, xs) + dcf_eval(1, k, xs))
    want = (np.asarray(xs, np.uint64) < np.asarray(alphas, np.uint64)).astype(np.int64)
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------- comparison

def _sign_impl(protocol):
    if protocol == "fss":
        return compare.sign_shares
    from primia_tpu.mpc import securenn

    return securenn.sign_shares


@pytest.mark.parametrize("protocol", ["fss", "snn"])
def test_sign_shares(protocol):
    x = jnp.array([1.0, -1.0, 0.5, -1e-4, 1e-4, -3000.0, 3000.0, 0.0])
    sx = S.share(KEY, fixed.encode(x))
    sg = _sign_impl(protocol)(jax.random.fold_in(KEY, 9), sx)
    got = np.asarray(S.reconstruct(sg))
    want = (np.asarray(x) < 0).astype(np.int64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("protocol", ["fss", "snn"])
def test_sign_shares_random(protocol):
    rng = np.random.default_rng(5)
    x = rng.uniform(-100, 100, 512)
    sx = S.share(KEY, fixed.encode(jnp.asarray(x)))
    sg = _sign_impl(protocol)(jax.random.fold_in(KEY, 10), sx)
    got = np.asarray(S.reconstruct(sg))
    np.testing.assert_array_equal(got, (x < 0).astype(np.int64))


def test_sign_shares_snn_ring_edges():
    """Integer edge cases across the 32-bit comparison domain."""
    from primia_tpu.mpc import securenn

    vals = jnp.array(
        [0, 1, -1, 2 ** 30, -(2 ** 30), 2 ** 31 - 1 - 65536, -(2 ** 31 - 65536)],
        jnp.int64,
    )
    sx = S.share(KEY, vals)
    sg = securenn.sign_shares(jax.random.fold_in(KEY, 11), sx)
    np.testing.assert_array_equal(
        np.asarray(S.reconstruct(sg)), np.asarray(vals < 0).astype(np.int64)
    )


# ---------------------------------------------------------- engine ops

def _ctx(i=0):
    return MpcContext(jax.random.fold_in(KEY, 100 + i))


def test_engine_relu():
    E = MpcEngine(_ctx(0))
    x = jnp.array([[1.5, -2.0], [-0.25, 3.0]])
    sx = S.share(KEY, fixed.encode(x))
    got = np.asarray(reveal_and_decode(E.relu(sx)))
    np.testing.assert_allclose(got, np.maximum(np.asarray(x), 0), atol=1e-4)


def test_engine_max_pool():
    E = MpcEngine(_ctx(1))
    rng = np.random.default_rng(6)
    x = rng.uniform(-2, 2, (1, 6, 6, 3))
    sx = S.share(KEY, fixed.encode(jnp.asarray(x)))
    got = np.asarray(reveal_and_decode(E.max_pool(sx, window=3, stride=2, padding=1)))
    from primia_tpu.nn.core import PLAIN

    want = np.asarray(PLAIN.max_pool(jnp.asarray(x), 3, 2, 1))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_engine_avg_pool():
    E = MpcEngine(_ctx(2))
    rng = np.random.default_rng(7)
    x = rng.uniform(-2, 2, (1, 4, 4, 2))
    sx = S.share(KEY, fixed.encode(jnp.asarray(x)))
    got = np.asarray(reveal_and_decode(E.avg_pool(sx, window=2, stride=2)))
    from primia_tpu.nn.core import PLAIN

    want = np.asarray(PLAIN.avg_pool(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_engine_affine_linear():
    E = MpcEngine(_ctx(3))
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (2, 3, 3, 4))
    scale = rng.uniform(0.5, 2, 4)
    off = rng.uniform(-1, 1, 4)
    k = jax.random.fold_in(KEY, 11)
    sx = S.share(k, fixed.encode(jnp.asarray(x)))
    ss = S.share(jax.random.fold_in(k, 1), fixed.encode(jnp.asarray(scale)))
    so = S.share(jax.random.fold_in(k, 2), fixed.encode(jnp.asarray(off)))
    got = np.asarray(reveal_and_decode(E.affine(sx, ss, so)))
    np.testing.assert_allclose(got, x * scale + off, atol=1e-3)


# ----------------------------------------------------- end-to-end parity

@pytest.mark.parametrize("protocol", ["snn", "fss"])
def test_encrypted_inference_matches_plaintext(protocol):
    """Workload 5 acceptance: encrypted logits ~= plaintext logits within
    fixed-point tolerance on a small conv net, under both comparison
    protocols."""
    from primia_tpu.config import Arguments
    from primia_tpu.mpc.inference import build_encrypted_predict
    from primia_tpu.nn import create_model

    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (2, 28, 28, 1), dtype=np.uint8)
    mean, std = np.array([0.5]), np.array([0.25])

    from primia_tpu.train.steps import build_predict_step

    plain = build_predict_step(md, args, mean, std)
    want = np.asarray(plain(params, state, imgs))

    enc = build_encrypted_predict(md, args, mean, std, seed=1, protocol=protocol)
    got = np.asarray(enc(params, state, imgs))
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0)
    assert got.argmax(1).tolist() == want.argmax(1).tolist()


@pytest.mark.parametrize("protocol", ["snn", "fss"])
def test_encrypted_inference_batch_tile_matches_plaintext(protocol):
    """``batch_tile`` runs the share-space forward under an on-device
    loop so program size is constant in the batch; the tiled form must
    still match plaintext (fresh dealer stream per tile, padded tail
    sliced off). Odd batch 5 with tile 2 exercises the padding path.
    Both protocols: the production tiled path defaults to fss."""
    from primia_tpu.config import Arguments
    from primia_tpu.mpc.inference import build_encrypted_predict
    from primia_tpu.nn import create_model
    from primia_tpu.train.steps import build_predict_step

    args = Arguments(model="simpleconv", train_resolution=28,
                     inference_resolution=28, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(10)
    imgs = rng.integers(0, 255, (5, 28, 28, 1), dtype=np.uint8)
    mean, std = np.array([0.5]), np.array([0.25])

    plain = build_predict_step(md, args, mean, std)
    want = np.asarray(plain(params, state, imgs))

    enc = build_encrypted_predict(md, args, mean, std, seed=1, batch_tile=2,
                                  protocol=protocol)
    got = np.asarray(enc(params, state, imgs))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0)
    assert got.argmax(1).tolist() == want.argmax(1).tolist()


# ---------------------------------------------------------- ring limb ops

def test_limb_matmul_matches_native():
    """The TPU byte-limb matmul path must agree with native int64
    (exercised on CPU by calling the limb machinery directly)."""
    from primia_tpu.mpc import ring_ops

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.integers(-2 ** 62, 2 ** 62, (5, 7)), jnp.int64)
    b = jnp.asarray(rng.integers(-2 ** 62, 2 ** 62, (7, 4)), jnp.int64)

    def dot_i8(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    got = ring_ops._limb_bilinear(dot_i8, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(a @ b))


def test_limb_conv_matches_native():
    from primia_tpu.mpc import ring_ops

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(-2 ** 40, 2 ** 40, (1, 5, 5, 3)), jnp.int64)
    w = jnp.asarray(rng.integers(-2 ** 40, 2 ** 40, (3, 3, 3, 2)), jnp.int64)

    def conv_i8(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    got = ring_ops._limb_bilinear(conv_i8, x, w)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_to_limbs_roundtrip():
    from primia_tpu.mpc.ring_ops import to_limbs

    rng = np.random.default_rng(13)
    v = jnp.asarray(rng.integers(-2 ** 63, 2 ** 63 - 1, 64), jnp.int64)
    limbs = to_limbs(v)
    assert limbs.dtype == jnp.int8
    back = sum(
        limbs[i].astype(jnp.int64) << jnp.int64(8 * i) for i in range(8)
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))


def test_fss_sign_shares_tiled_matches_untiled_semantics():
    """Tiled (lax.map) FSS comparison equals the plain-sign ground
    truth, including the padded final tile — the mechanism that lets
    protocol='fss' scale to whole-ResNet relu batches (round-1 ceiling:
    key material is ~1KB/element, so one-program eval at 224px could
    neither compile nor fit)."""
    from primia_tpu.mpc.compare import sign_shares

    rng = np.random.default_rng(11)
    v = rng.integers(-(2**30), 2**30, 1301).astype(np.int64)
    x = S.share(jax.random.PRNGKey(3), jnp.asarray(v))
    s = sign_shares(jax.random.PRNGKey(4), x, tile=256)  # 6 tiles, padded
    np.testing.assert_array_equal(
        np.asarray(S.reconstruct(s)), (v < 0).astype(np.int64))
    # single-tile fast path unchanged
    s1 = sign_shares(jax.random.PRNGKey(4), x, tile=4096)
    np.testing.assert_array_equal(
        np.asarray(S.reconstruct(s1)), (v < 0).astype(np.int64))


def test_engine_group_norm_matches_plain():
    """Private GroupNorm over shares (mpc/engine.py:group_norm) vs the
    plaintext group_norm: per-example group stats + Newton rsqrt +
    private affine — the path that serves normalization=group
    (DP-trained) models encrypted."""
    from primia_tpu.nn.core import PLAIN, group_norm

    E = MpcEngine(_ctx(31))
    rng = np.random.default_rng(5)
    x = rng.normal(0.0, 1.5, (3, 6, 6, 32)).astype(np.float32)
    gamma = rng.normal(1.0, 0.2, 32).astype(np.float32)
    beta = rng.normal(0.0, 0.2, 32).astype(np.float32)

    want = np.asarray(group_norm(
        PLAIN, jnp.asarray(x), {"gamma": jnp.asarray(gamma),
                                "beta": jnp.asarray(beta)}, groups=8))
    sx = S.share(jax.random.fold_in(KEY, 61), fixed.encode(x))
    sg = S.share(jax.random.fold_in(KEY, 62), fixed.encode(gamma))
    sb = S.share(jax.random.fold_in(KEY, 63), fixed.encode(beta))
    got = np.asarray(reveal_and_decode(
        E.group_norm(sx, sg, sb, groups=8)))
    np.testing.assert_allclose(got, want, atol=0.03)


@pytest.mark.slow
def test_encrypted_groupnorm_resnet_matches_plaintext():
    """End-to-end: a normalization=group resnet-18 (the DP-trainable
    variant) serves ENCRYPTED — logits match plaintext within
    fixed-point + Newton-rsqrt tolerance."""
    from primia_tpu.config import Arguments
    from primia_tpu.mpc.inference import build_encrypted_predict
    from primia_tpu.nn import create_model
    from primia_tpu.train.steps import build_predict_step

    args = Arguments(model="resnet-18", train_resolution=32,
                     inference_resolution=32, pooling_type="max",
                     normalization="group")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    # zero-init head would make all logits 0; give it a real head
    k = jax.random.PRNGKey(9)
    params["fc"] = {"w": 0.1 * jax.random.normal(k, params["fc"]["w"].shape),
                    "b": jnp.zeros_like(params["fc"]["b"])}
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (2, 32, 32, 1), dtype=np.uint8)
    mean, std = np.array([0.5]), np.array([0.25])

    want = np.asarray(
        build_predict_step(md, args, mean, std)(params, state, imgs))
    enc = build_encrypted_predict(md, args, mean, std, seed=1)
    got = np.asarray(enc(params, state, imgs))
    assert np.abs(got - want).max() < 0.05
    assert (got.argmax(1) == want.argmax(1)).all()
