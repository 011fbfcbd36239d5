"""PRZS, replicated (falcon-style) 3-party sharing, Paillier HE.

Reference components: ``syft/frameworks/torch/mpc/przs.py``,
``.../interpreters/replicated_shared.py``, ``.../interpreters/paillier.py``.
Verification model per SURVEY.md §4: share-vs-plaintext equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.mpc import fixed, paillier, przs, replicated


class TestPRZS:
    def test_sums_to_zero(self):
        ring = przs.setup(jax.random.PRNGKey(0), 5)
        z = przs.zero_shares(ring, (7, 3))
        assert z.shape == (5, 7, 3)
        np.testing.assert_array_equal(np.sum(np.asarray(z), axis=0), 0)

    def test_shares_are_nontrivial(self):
        ring = przs.setup(jax.random.PRNGKey(1), 3)
        z = np.asarray(przs.zero_shares(ring, (100,)))
        assert np.count_nonzero(z) > 250  # individually random


class TestReplicated:
    def test_share_reconstruct_roundtrip(self, rng):
        v = jnp.asarray(rng.integers(-(2**40), 2**40, (4, 5)), jnp.int64)
        x = replicated.share(jax.random.PRNGKey(0), v)
        assert x.data.shape == (3, 2, 4, 5)
        np.testing.assert_array_equal(np.asarray(replicated.reconstruct(x)), v)

    def test_replica_consistency(self):
        """Party i's slot 1 equals party i+1's slot 0 (the defining
        invariant of the replicated layout)."""
        x = replicated.share(jax.random.PRNGKey(3), jnp.arange(6, dtype=jnp.int64))
        d = np.asarray(x.data)
        np.testing.assert_array_equal(d[:, 1], np.roll(d[:, 0], -1, axis=0))

    def test_single_share_reveals_nothing(self):
        """Two different secrets, same dealer randomness: any single
        party's view is identical (honest-majority secrecy)."""
        a = replicated.share(jax.random.PRNGKey(7), jnp.int64(123456))
        b = replicated.share(jax.random.PRNGKey(7), jnp.int64(-999))
        d_a, d_b = np.asarray(a.data), np.asarray(b.data)
        # parties 0 and 1 hold only (r1, r2) in some arrangement of
        # slots -> those slots must match across secrets
        np.testing.assert_array_equal(d_a[0, 0], d_b[0, 0])  # r1
        np.testing.assert_array_equal(d_a[0, 1], d_b[0, 1])  # r2
        np.testing.assert_array_equal(d_a[1, 0], d_b[1, 0])  # r2

    def test_add_sub_public_ops(self, rng):
        va = jnp.asarray(rng.integers(-1000, 1000, (8,)), jnp.int64)
        vb = jnp.asarray(rng.integers(-1000, 1000, (8,)), jnp.int64)
        a = replicated.share(jax.random.PRNGKey(1), va)
        b = replicated.share(jax.random.PRNGKey(2), vb)
        np.testing.assert_array_equal(
            np.asarray(replicated.reconstruct(replicated.add(a, b))), va + vb)
        np.testing.assert_array_equal(
            np.asarray(replicated.reconstruct(replicated.sub(a, b))), va - vb)
        np.testing.assert_array_equal(
            np.asarray(replicated.reconstruct(replicated.add_public(a, 17))), va + 17)
        np.testing.assert_array_equal(
            np.asarray(replicated.reconstruct(replicated.mul_public(a, -3))), va * -3)

    def test_private_mul(self, rng):
        va = jnp.asarray(rng.integers(-(2**20), 2**20, (6,)), jnp.int64)
        vb = jnp.asarray(rng.integers(-(2**20), 2**20, (6,)), jnp.int64)
        a = replicated.share(jax.random.PRNGKey(1), va)
        b = replicated.share(jax.random.PRNGKey(2), vb)
        z = replicated.mul(jax.random.PRNGKey(3), a, b)
        np.testing.assert_array_equal(np.asarray(replicated.reconstruct(z)), va * vb)

    def test_private_matmul(self, rng):
        va = jnp.asarray(rng.integers(-(2**18), 2**18, (3, 4)), jnp.int64)
        vb = jnp.asarray(rng.integers(-(2**18), 2**18, (4, 2)), jnp.int64)
        a = replicated.share(jax.random.PRNGKey(1), va)
        b = replicated.share(jax.random.PRNGKey(2), vb)
        z = replicated.matmul(jax.random.PRNGKey(3), a, b)
        np.testing.assert_array_equal(np.asarray(replicated.reconstruct(z)), va @ vb)

    def test_fixed_point_mul_with_truncation(self, rng):
        xf = rng.uniform(-4, 4, (10,))
        yf = rng.uniform(-4, 4, (10,))
        x = replicated.share(jax.random.PRNGKey(1), fixed.encode(xf))
        y = replicated.share(jax.random.PRNGKey(2), fixed.encode(yf))
        z = replicated.truncate(
            jax.random.PRNGKey(4), replicated.mul(jax.random.PRNGKey(3), x, y))
        out = np.asarray(fixed.decode(replicated.reconstruct(z)))
        np.testing.assert_allclose(out, xf * yf, atol=1e-3)

    def test_truncate_single_party_reveals_nothing(self, rng):
        """Post-truncate state must stay secret against a single party:
        no party's replicated pair may sum (or otherwise combine) to the
        plaintext — the re-randomization regression for the (t0, 0, t1)
        layout where party 2 held both halves of the 2-of-2 split."""
        xf = rng.uniform(1.0, 4.0, (32,))
        x = replicated.share(jax.random.PRNGKey(1), fixed.encode(xf))
        sq = replicated.mul(jax.random.PRNGKey(2), x, x)
        z = replicated.truncate(jax.random.PRNGKey(5), sq)
        plain = fixed.encode(xf * xf)
        d = np.asarray(z.data)
        for party in range(3):
            pair_sum = d[party, 0] + d[party, 1]
            assert not np.allclose(
                np.asarray(fixed.decode(pair_sum)), xf * xf, atol=0.5), (
                f"party {party}'s pair reconstructs the plaintext")
        # and no single slot is the plaintext either
        for party in range(3):
            for slot in range(2):
                assert np.abs(
                    np.asarray(d[party, slot]) - np.asarray(plain)).min() > 0

    def test_jit_traceable(self):
        @jax.jit
        def f(key, v):
            x = replicated.share(key, v)
            y = replicated.mul(jax.random.fold_in(key, 1), x, x)
            return replicated.reconstruct(y)

        v = jnp.arange(-3, 3, dtype=jnp.int64)
        np.testing.assert_array_equal(np.asarray(f(jax.random.PRNGKey(0), v)), v * v)


class TestPaillier:
    @pytest.fixture(scope="class")
    def sk(self):
        return paillier.keygen(bits=256)  # small key: test speed only

    def test_roundtrip(self, sk, rng):
        v = rng.uniform(-100, 100, (3, 4))
        ct = paillier.encrypt(sk.public, v)
        np.testing.assert_allclose(paillier.decrypt(sk, ct), v, atol=1e-4)

    def test_homomorphic_add(self, sk, rng):
        a, b = rng.uniform(-50, 50, (2, 6))
        ca = paillier.encrypt(sk.public, a)
        cb = paillier.encrypt(sk.public, b)
        np.testing.assert_allclose(paillier.decrypt(sk, ca + cb), a + b, atol=1e-4)
        np.testing.assert_allclose(paillier.decrypt(sk, ca - cb), a - b, atol=1e-4)

    def test_plaintext_scalar_mul(self, sk, rng):
        a = rng.uniform(-10, 10, (5,))
        ca = paillier.encrypt(sk.public, a)
        np.testing.assert_allclose(paillier.decrypt(sk, ca * 7), a * 7, atol=1e-3)
        np.testing.assert_allclose(paillier.decrypt(sk, ca * -2), a * -2, atol=1e-3)

    def test_ciphertexts_randomized(self, sk):
        c1 = paillier.encrypt(sk.public, np.array([1.0]))
        c2 = paillier.encrypt(sk.public, np.array([1.0]))
        assert c1.data[0] != c2.data[0]  # semantic security: fresh r

    def test_cross_key_rejected(self, sk):
        other = paillier.keygen(bits=256)
        ca = paillier.encrypt(sk.public, np.array([1.0]))
        cb = paillier.encrypt(other.public, np.array([1.0]))
        with pytest.raises(ValueError):
            ca + cb
