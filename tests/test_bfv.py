"""BFV homomorphic encryption (reference ``syft/frameworks/torch/he/fv``).

Small-but-real parameters (n=2048, three 30-bit primes) — enough noise
budget for additions and relinearized multiplication depth 2.
"""

import numpy as np
import pytest

from primia_tpu.mpc import bfv


@pytest.fixture(scope="module")
def setup():
    ctx = bfv.Context(bfv.EncryptionParams(poly_modulus_degree=2048))
    sk, pk, rk = bfv.KeyGenerator(ctx, seed=0).keygen()
    return ctx, sk, pk, rk


class TestNTT:
    def test_roundtrip_and_negacyclic_product(self):
        n = 256
        p = bfv.ntt_primes(n, 30, 1)[0]
        plan = bfv._NttPlan(n, p)
        rng = np.random.default_rng(0)
        a = rng.integers(0, p, n)
        np.testing.assert_array_equal(plan.inv(plan.fwd(a)), a % p)
        # negacyclic: x^(n-1) * x = x^n = -1
        u = np.zeros(n, np.int64)
        u[n - 1] = 1
        v = np.zeros(n, np.int64)
        v[1] = 1
        prod = plan.inv(plan.fwd(u) * plan.fwd(v) % p)
        expect = np.zeros(n, np.int64)
        expect[0] = p - 1
        np.testing.assert_array_equal(prod, expect)

    def test_batched_transform(self):
        n = 128
        p = bfv.ntt_primes(n, 30, 1)[0]
        plan = bfv._NttPlan(n, p)
        rng = np.random.default_rng(1)
        batch = rng.integers(0, p, (3, 4, n))
        np.testing.assert_array_equal(plan.inv(plan.fwd(batch)), batch)


class TestContext:
    def test_crt_compose_decompose_roundtrip(self, setup):
        ctx, *_ = setup
        rng = np.random.default_rng(2)
        vals = np.array([int(rng.integers(-(2**50), 2**50)) for _ in range(16)],
                        object)
        limbs = ctx.decompose(vals, ctx.q_primes)
        np.testing.assert_array_equal(ctx.compose(limbs, ctx.q_primes), vals)

    def test_extended_basis_holds_tensor_products(self, setup):
        ctx, *_ = setup
        M = 1
        for p in ctx.ext_primes:
            M *= p
        assert M > ctx.n * ctx.q**2

    def test_invalid_params_rejected(self):
        with pytest.raises(ValueError):
            bfv.Context(bfv.EncryptionParams(poly_modulus_degree=100))
        with pytest.raises(ValueError):
            bfv.Context(bfv.EncryptionParams(plain_modulus=17))


class TestEncryptDecrypt:
    def test_public_key_roundtrip(self, setup):
        ctx, sk, pk, _ = setup
        enc = bfv.Encryptor(ctx, pk)
        dec = bfv.Decryptor(ctx, sk)
        m = np.zeros(ctx.n, np.int64)
        m[:5] = [1, 2, 3, 4, 5]
        out = dec.decrypt(enc.encrypt(bfv.Plaintext(m)))
        np.testing.assert_array_equal(out.data, m)

    def test_symmetric_roundtrip(self, setup):
        ctx, sk, _, _ = setup
        enc = bfv.Encryptor(ctx, sk)
        dec = bfv.Decryptor(ctx, sk)
        m = np.arange(ctx.n, dtype=np.int64) % ctx.t
        out = dec.decrypt(enc.encrypt(bfv.Plaintext(m)))
        np.testing.assert_array_equal(out.data, m)

    def test_fresh_budget_positive(self, setup):
        ctx, sk, pk, _ = setup
        ct = bfv.Encryptor(ctx, pk).encrypt(
            bfv.Plaintext(np.ones(ctx.n, np.int64)))
        assert bfv.Decryptor(ctx, sk).invariant_noise_budget(ct) > 20


class TestEvaluator:
    def test_add_sub_negate(self, setup):
        ctx, sk, pk, _ = setup
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        rng = np.random.default_rng(3)
        a = rng.integers(0, ctx.t, ctx.n)
        b = rng.integers(0, ctx.t, ctx.n)
        ca, cb = enc.encrypt(bfv.Plaintext(a)), enc.encrypt(bfv.Plaintext(b))
        np.testing.assert_array_equal(
            dec.decrypt(ev.add(ca, cb)).data, (a + b) % ctx.t)
        np.testing.assert_array_equal(
            dec.decrypt(ev.sub(ca, cb)).data, (a - b) % ctx.t)
        np.testing.assert_array_equal(
            dec.decrypt(ev.negate(ca)).data, (-a) % ctx.t)

    def test_add_mul_plain(self, setup):
        ctx, sk, pk, _ = setup
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        a = np.zeros(ctx.n, np.int64)
        a[0] = 7
        pt = np.zeros(ctx.n, np.int64)
        pt[0] = 6
        ca = enc.encrypt(bfv.Plaintext(a))
        assert dec.decrypt(ev.add(ca, bfv.Plaintext(pt))).data[0] == 13
        assert dec.decrypt(ev.mul(ca, bfv.Plaintext(pt))).data[0] == 42

    def test_cipher_mul_and_relin(self, setup):
        ctx, sk, pk, rk = setup
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        a = np.zeros(ctx.n, np.int64)
        a[0], a[1] = 3, 1  # 3 + x
        b = np.zeros(ctx.n, np.int64)
        b[0], b[1] = 5, 2  # 5 + 2x
        ca, cb = enc.encrypt(bfv.Plaintext(a)), enc.encrypt(bfv.Plaintext(b))
        prod = ev.mul(ca, cb)  # size-3
        assert len(prod.parts) == 3
        out3 = dec.decrypt(prod).data  # decrypt handles size 3
        assert (out3[0], out3[1], out3[2]) == (15, 11, 2)
        rel = ev.relin(prod, rk)
        assert len(rel.parts) == 2
        out2 = dec.decrypt(rel).data
        np.testing.assert_array_equal(out2, out3)

    def test_mul_depth_two(self, setup):
        ctx, sk, pk, rk = setup
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        m = np.zeros(ctx.n, np.int64)
        m[0] = 3
        ct = enc.encrypt(bfv.Plaintext(m))
        sq = ev.mul(ct, ct, relin_keys=rk)
        quad = ev.mul(sq, sq, relin_keys=rk)
        assert dec.decrypt(quad).data[0] == 81

    def test_mul_requires_size2(self, setup):
        ctx, sk, pk, _ = setup
        enc, ev = bfv.Encryptor(ctx, pk), bfv.Evaluator(ctx)
        ca = enc.encrypt(bfv.Plaintext(np.zeros(ctx.n, np.int64)))
        big = ev.mul(ca, ca)
        with pytest.raises(ValueError):
            ev.mul(big, ca)


class TestEncoders:
    def test_integer_encoder(self, setup):
        ctx, sk, pk, _ = setup
        ie = bfv.IntegerEncoder(ctx)
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        for v in (0, 1, 42, -97, 123456):
            assert ie.decode(ie.encode(v)) == v
        c = ev.add(enc.encrypt(ie.encode(100)), enc.encrypt(ie.encode(-58)))
        assert ie.decode(dec.decrypt(c)) == 42

    def test_batch_encoder_simd(self, setup):
        ctx, sk, pk, rk = setup
        be = bfv.BatchEncoder(ctx)
        enc, dec, ev = (bfv.Encryptor(ctx, pk), bfv.Decryptor(ctx, sk),
                        bfv.Evaluator(ctx))
        rng = np.random.default_rng(4)
        a = rng.integers(0, 100, ctx.n)
        b = rng.integers(0, 100, ctx.n)
        ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
        np.testing.assert_array_equal(
            be.decode(dec.decrypt(ev.add(ca, cb))), (a + b) % ctx.t)
        # slot-wise product: one ciphertext mul = n parallel int muls
        prod = ev.mul(ca, cb, relin_keys=rk)
        np.testing.assert_array_equal(
            be.decode(dec.decrypt(prod)), (a * b) % ctx.t)

    def test_batch_encode_roundtrip(self, setup):
        ctx, *_ = setup
        be = bfv.BatchEncoder(ctx)
        vals = np.array([5, -3, 7])
        out = be.decode(be.encode(vals), count=3)
        np.testing.assert_array_equal(out, [5, -3, 7])
