"""SecureNN protocol-suite completion: select_share, share_convert,
64-bit sign, private integer division (reference
``syft/frameworks/torch/mpc/securenn.py:137-710``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.mpc import engine as E
from primia_tpu.mpc import functions as F
from primia_tpu.mpc import securenn
from primia_tpu.mpc import shares as S
from primia_tpu.mpc import fixed

KEY = jax.random.PRNGKey(123)


def _share(v, k=7):
    return S.share(jax.random.fold_in(KEY, k), jnp.asarray(v, jnp.int64))


def test_select_share():
    x = np.array([10, -5, 7, 0], np.int64)
    y = np.array([-1, 99, 7, 3], np.int64)
    alpha = np.array([0, 1, 1, 0], np.int64)
    out = securenn.select_share(
        jax.random.fold_in(KEY, 1), _share(alpha, 1), _share(x, 2), _share(y, 3))
    np.testing.assert_array_equal(np.asarray(S.reconstruct(out)),
                                  np.where(alpha == 1, y, x))
    # re-randomization: the output shares differ from a plain mix
    assert not np.array_equal(np.asarray(out.data[0]), x * 0)


def test_sign_shares_64bit_domain():
    """Values far outside the 32-bit default domain."""
    rng = np.random.default_rng(0)
    v = rng.integers(-(1 << 61), 1 << 61, size=(64,), dtype=np.int64)
    v[:4] = [0, -1, (1 << 62) - 1, -(1 << 62)]
    got = S.reconstruct(securenn.sign_shares(
        jax.random.fold_in(KEY, 4), _share(v, 5), n_bits=64))
    np.testing.assert_array_equal(np.asarray(got), (v < 0).astype(np.int64))


def test_share_convert_roundtrip():
    """Z_{2^64} -> Z_{2^64 - 1}: value preserved; shares open mod M."""
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1 << 62, size=(32,), dtype=np.int64)
    v[:3] = [0, 1, (1 << 62) - 1]
    conv = securenn.share_convert(jax.random.fold_in(KEY, 6), _share(v, 6))
    opened = np.asarray(securenn.reconstruct_mod_m(conv))
    np.testing.assert_array_equal(opened, v.astype(np.uint64))


def test_mod_m_arithmetic():
    M = int(np.uint64(securenn.M_RING))
    a = np.array([0, 1, M - 1, M - 1, 123456789], np.uint64)
    b = np.array([0, M - 1, M - 1, 1, M - 2], np.uint64)
    got = np.asarray(securenn.add_mod_m(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([(int(x) + int(y)) % M for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(got, want)
    ng = np.asarray(securenn.neg_mod_m(jnp.asarray(a)))
    np.testing.assert_array_equal(
        ng, np.array([(M - int(x)) % M for x in a], np.uint64))


def test_division_integer():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 20, size=(16,), dtype=np.int64)
    y = rng.integers(1, 1 << 10, size=(16,), dtype=np.int64)
    x[:2] = [0, 7]
    y[:2] = [3, 7]
    q = securenn.division(jax.random.fold_in(KEY, 8), _share(x, 8),
                          _share(y, 9), bit_len_max=24)
    np.testing.assert_array_equal(np.asarray(S.reconstruct(q)), x // y)


def test_division_scalar_divisor():
    x = np.array([100, 20, 3], np.int64)
    y = np.array([7], np.int64)
    q = securenn.division(jax.random.fold_in(KEY, 10), _share(x, 10),
                          _share(y, 11), bit_len_max=8)
    np.testing.assert_array_equal(np.asarray(S.reconstruct(q)), x // 7)


def test_fpt_div_securenn_backend():
    """functions.div(method='securenn') — exact floor semantics on the
    scaled numerator, signs fixed up."""
    ctx = E.MpcContext(jax.random.PRNGKey(3), protocol="snn")
    x = np.array([1.0, -2.5, 0.5, 4.0, -3.0])
    y = np.array([2.5, 0.8, -1.6, 3.0, -0.7])
    xs = E.encode_and_share(jax.random.PRNGKey(4), jnp.asarray(x))
    ys = E.encode_and_share(jax.random.PRNGKey(5), jnp.asarray(y))
    got = np.asarray(E.reveal_and_decode(F.div(ctx, xs, ys, "securenn")))
    np.testing.assert_allclose(got, x / y, atol=2e-4)


def test_maxpool_and_deriv():
    ctx = E.MpcContext(jax.random.PRNGKey(6), protocol="snn")
    a = np.array([[0.5, -1.0], [3.25, 0.0]])
    sh = E.encode_and_share(jax.random.PRNGKey(7), jnp.asarray(a))
    mx, idx = F.maxpool(ctx, sh)
    assert abs(float(E.reveal_and_decode(mx)) - 3.25) < 1e-4
    assert float(E.reveal_and_decode(idx)) == 2  # flattened index
    oh = F.maxpool_deriv(ctx, sh)
    np.testing.assert_array_equal(
        np.asarray(S.reconstruct(oh)), np.array([[0, 0], [1, 0]]))


def test_share_convert_shares_are_masked():
    """Each party's converted share alone looks uniform: a batch of
    identical plaintext values yields (with overwhelming probability)
    all-distinct per-party shares."""
    v = np.full((256,), 5, np.int64)
    conv = securenn.share_convert(jax.random.fold_in(KEY, 20), _share(v, 21))
    for p in range(2):
        assert np.unique(np.asarray(conv[p])).size == 256
