"""BFV (Brakerski/Fan-Vercauteren) somewhat-homomorphic encryption.

Reference: ``syft/frameworks/torch/he/fv/`` — Context/KeyGenerator/
Encryptor/Decryptor/Evaluator/IntegerEncoder over R_q = Z_q[x]/(x^n+1),
with an RNS coefficient modulus (``util/rns_base.py``, ``rns_tool.py``)
and relinearization keys. The reference implements schoolbook
polynomial products over Python lists; this rebuild keeps the whole
online path in **vectorized int64 residue arithmetic** with negacyclic
NTTs (O(n log n), every stage a batched elementwise modmul — the form
that vectorizes on any XLA backend), and uses exact big-int CRT only at
the two places BFV fundamentally needs leaving the RNS domain (the
t/q rounding after a ciphertext product, and decryption).

Design notes
- coeff modulus q = product of NTT-friendly 30-bit primes (p = 1 mod 2n)
  so every modmul fits int64 (operands < 2^30, products < 2^60).
- ciphertext-ciphertext multiply lifts to an extended prime basis large
  enough to hold the exact integer tensor product (the BEHZ/HPS role of
  ``rns_tool.py``), NTT-multiplies there, then CRT-composes for the
  rounded t/q scale-down.
- relinearization uses RNS gadget decomposition: the digits of c2 are
  its residues mod each q_i (no base-w bigint decomposition needed).
- plain modulus t = 65537 = 1 mod 2n enables SIMD batching: a
  BatchEncoder packs n integer slots per ciphertext via a mod-t NTT
  (the vectorized-by-construction encoding; the reference ships only
  the binary IntegerEncoder).

These are demonstration parameters, as in the reference (its FV stack
is marked partial and unused by shipped workloads); key sizes here are
chosen for correctness tests, not a security review.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import numpy as np

# --------------------------------------------------------------- modular

def _pow_mod(b: int, e: int, p: int) -> int:
    return pow(b, e, p)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def ntt_primes(n: int, bits: int, count: int, skip: Sequence[int] = ()) -> List[int]:
    """``count`` primes p = 1 (mod 2n) of ~``bits`` bits (NTT-friendly;
    reference ``util/numth.py`` role)."""
    out, step = [], 2 * n
    c = ((1 << bits) // step) * step + 1
    while len(out) < count:
        if c.bit_length() > bits + 1:
            raise RuntimeError("prime search overran")
        if _is_prime(c) and c not in skip:
            out.append(c)
        c += step
    return out


def _primitive_2n_root(n: int, p: int) -> int:
    """psi with psi^n = -1 mod p (primitive 2n-th root of unity)."""
    for g in range(2, 10000):
        psi = _pow_mod(g, (p - 1) // (2 * n), p)
        if _pow_mod(psi, n, p) == p - 1:
            return psi
    raise RuntimeError("no primitive root found")


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class _NttPlan:
    """Per-prime negacyclic NTT tables; transforms are vectorized over
    arbitrary leading batch axes."""

    def __init__(self, n: int, p: int):
        self.n, self.p = n, p
        psi = _primitive_2n_root(n, p)
        omega = psi * psi % p
        self.psi_pows = np.array(
            [_pow_mod(psi, i, p) for i in range(n)], np.int64)
        ipsi = _pow_mod(psi, p - 2, p)
        self.ipsi_pows = np.array(
            [_pow_mod(ipsi, i, p) for i in range(n)], np.int64)
        self.omega_pows = np.array(
            [_pow_mod(omega, i, p) for i in range(n)], np.int64)
        iomega = _pow_mod(omega, p - 2, p)
        self.iomega_pows = np.array(
            [_pow_mod(iomega, i, p) for i in range(n)], np.int64)
        self.n_inv = _pow_mod(n, p - 2, p)
        self.brev = _bit_reverse_perm(n)

    def _core(self, a: np.ndarray, tw: np.ndarray) -> np.ndarray:
        p, n = self.p, self.n
        a = a[..., self.brev]
        length = 2
        while length <= n:
            half = length // 2
            w = tw[:: n // length][:half]
            a = a.reshape(*a.shape[:-1], n // length, length)
            lo, hi = a[..., :half], a[..., half:] * w % p
            a = np.concatenate([(lo + hi) % p, (lo - hi) % p], axis=-1)
            a = a.reshape(*a.shape[:-2], n)
            length *= 2
        return a

    def fwd(self, a: np.ndarray) -> np.ndarray:
        return self._core(a * self.psi_pows % self.p, self.omega_pows)

    def inv(self, a: np.ndarray) -> np.ndarray:
        b = self._core(a, self.iomega_pows) * self.n_inv % self.p
        return b * self.ipsi_pows % self.p


# --------------------------------------------------------------- context

class EncryptionParams(NamedTuple):
    """Reference ``encryption_params.py``: (poly degree, coeff modulus
    primes, plain modulus)."""

    poly_modulus_degree: int = 2048
    coeff_bits: int = 30
    coeff_count: int = 3
    plain_modulus: int = 65537


class Context:
    """Precomputed tables: NTT plans per prime (base + extended), CRT
    constants, delta = floor(q/t) residues (reference ``context.py`` +
    ``util/rns_base.py``)."""

    def __init__(self, params: EncryptionParams = EncryptionParams()):
        n, t = params.poly_modulus_degree, params.plain_modulus
        if n & (n - 1):
            raise ValueError("poly_modulus_degree must be a power of 2")
        if (t - 1) % (2 * n):
            raise ValueError("plain_modulus must be 1 mod 2n for batching")
        self.params = params
        self.n, self.t = n, t
        self.q_primes = ntt_primes(n, params.coeff_bits, params.coeff_count)
        self.q = int(np.prod([int(p) for p in self.q_primes], dtype=object))
        # extended basis for exact tensor products: |coeff| <= n*(q/2)^2
        need = (self.q ** 2 * n).bit_length() + 2
        extra = max(1, -(-(need - self.q.bit_length()) // (params.coeff_bits - 1)))
        self.ext_primes = self.q_primes + ntt_primes(
            n, params.coeff_bits, extra, skip=self.q_primes)
        self.plans = {p: _NttPlan(n, p) for p in self.ext_primes}
        self.delta = self.q // t
        self.delta_mod = np.array([self.delta % p for p in self.q_primes], np.int64)
        # CRT compose constants for the base and extended bases
        self._compose_cache = {}

    def _compose_consts(self, primes: Sequence[int]):
        key = tuple(primes)
        if key not in self._compose_cache:
            M = 1
            for p in primes:
                M *= p
            consts = []
            for p in primes:
                Mi = M // p
                consts.append((Mi, _pow_mod(Mi % p, p - 2, p)))
            self._compose_cache[key] = (M, consts)
        return self._compose_cache[key]

    def compose(self, limbs: np.ndarray, primes: Sequence[int]) -> np.ndarray:
        """(k, ..., n) residues -> centered big-int coefficients in
        (-M/2, M/2] (object dtype). One of the two exact-bigint steps
        (with the t/q rescale) that BFV cannot keep in RNS."""
        M, consts = self._compose_consts(primes)
        acc = np.zeros(limbs.shape[1:], object)
        for r, (Mi, yi) in zip(limbs, consts):
            acc = acc + r.astype(object) * ((Mi * yi) % M)
        acc = acc % M
        return np.where(acc > M // 2, acc - M, acc)

    def decompose(self, coeffs: np.ndarray, primes: Sequence[int]) -> np.ndarray:
        """big-int (object) coefficients -> (k, ...) int64 residues."""
        return np.stack([
            np.frompyfunc(lambda c, pp=p: int(c) % pp, 1, 1)(coeffs).astype(np.int64)
            for p in primes
        ])


# ------------------------------------------------------------------ keys

class SecretKey(NamedTuple):
    data: np.ndarray  # (k, n) residues of a ternary polynomial


class PublicKey(NamedTuple):
    p0: np.ndarray  # (k, n)
    p1: np.ndarray


class RelinKeys(NamedTuple):
    r0: np.ndarray  # (k_digits, k, n)
    r1: np.ndarray


def _sample_ternary(rng, n) -> np.ndarray:
    return rng.integers(-1, 2, n).astype(np.int64)


def _sample_error(rng, n, sigma: float = 3.2) -> np.ndarray:
    # centered binomial with matching variance (2*10/4 = 5 ~ sigma^2=10.24/3.2^2)
    k = 21
    return (rng.integers(0, 2, (k, n)).sum(0) - rng.integers(0, 2, (k, n)).sum(0)
            ).astype(np.int64)


def _to_rns(ctx: Context, poly: np.ndarray, primes=None) -> np.ndarray:
    primes = primes or ctx.q_primes
    return np.stack([poly % p for p in primes]).astype(np.int64)


def _poly_mul_rns(ctx: Context, a: np.ndarray, b: np.ndarray, primes=None) -> np.ndarray:
    """Negacyclic product per RNS limb via NTT."""
    primes = primes or ctx.q_primes
    out = []
    for i, p in enumerate(primes):
        plan = ctx.plans[p]
        out.append(plan.inv(plan.fwd(a[i]) * plan.fwd(b[i]) % p))
    return np.stack(out)


def _add(a, b, primes) -> np.ndarray:
    mods = np.array(primes, np.int64).reshape(-1, *([1] * (a.ndim - 1)))
    return (a + b) % mods


def _sub(a, b, primes) -> np.ndarray:
    mods = np.array(primes, np.int64).reshape(-1, *([1] * (a.ndim - 1)))
    return (a - b) % mods


class KeyGenerator:
    """Reference ``key_generator.py``: produces secret, public and
    relinearization keys."""

    def __init__(self, context: Context, seed: int = 0):
        self.ctx = context
        self.rng = np.random.default_rng(seed)

    def keygen(self):
        ctx, rng = self.ctx, self.rng
        s = _to_rns(ctx, _sample_ternary(rng, ctx.n))
        a = np.stack([rng.integers(0, p, ctx.n) for p in ctx.q_primes]).astype(np.int64)
        e = _to_rns(ctx, _sample_error(rng, ctx.n))
        p0 = _sub(np.zeros_like(a), _add(_poly_mul_rns(ctx, a, s), e, ctx.q_primes),
                  ctx.q_primes)
        self.secret_key = SecretKey(s)
        self.public_key = PublicKey(p0, a)
        self.relin_keys = self._make_relin(s)
        return self.secret_key, self.public_key, self.relin_keys

    def _make_relin(self, s: np.ndarray) -> RelinKeys:
        """RNS gadget keys: rk_i encrypts q_hat_i * s^2 where
        q_hat_i = (q/q_i) * [(q/q_i)^{-1} mod q_i]."""
        ctx, rng = self.ctx, self.rng
        s2 = _poly_mul_rns(ctx, s, s)
        r0s, r1s = [], []
        for i, qi in enumerate(ctx.q_primes):
            Mi = ctx.q // qi
            qhat = Mi * _pow_mod(Mi % qi, qi - 2, qi)
            qhat_mod = np.array([qhat % p for p in ctx.q_primes], np.int64)
            a = np.stack([rng.integers(0, p, ctx.n) for p in ctx.q_primes]).astype(np.int64)
            e = _to_rns(ctx, _sample_error(rng, ctx.n))
            body = _add(_poly_mul_rns(ctx, a, s), e, ctx.q_primes)
            target = s2 * qhat_mod[:, None] % np.array(ctx.q_primes, np.int64)[:, None]
            r0s.append(_sub(target, body, ctx.q_primes))
            r1s.append(a)
        return RelinKeys(np.stack(r0s), np.stack(r1s))


# ------------------------------------------------------------ ct / plain

class Plaintext(NamedTuple):
    data: np.ndarray  # (n,) int64 coefficients mod t


class Ciphertext(NamedTuple):
    parts: tuple  # tuple of (k, n) RNS polys; len 2 normally, 3 pre-relin


class Encryptor:
    """Reference ``encryptor.py``: asymmetric (public-key) or symmetric
    (secret-key) encryption chosen by the key passed in."""

    def __init__(self, context: Context, key, seed: int = 1):
        self.ctx = context
        self.key = key
        self.rng = np.random.default_rng(seed)

    def encrypt(self, plain: Plaintext) -> Ciphertext:
        ctx, rng = self.ctx, self.rng
        dm = plain.data % ctx.t
        delta_m = ctx.delta_mod[:, None] * dm[None, :] % np.array(
            ctx.q_primes, np.int64)[:, None]
        if isinstance(self.key, PublicKey):
            u = _to_rns(ctx, _sample_ternary(rng, ctx.n))
            e1 = _to_rns(ctx, _sample_error(rng, ctx.n))
            e2 = _to_rns(ctx, _sample_error(rng, ctx.n))
            c0 = _add(_add(_poly_mul_rns(ctx, self.key.p0, u), e1, ctx.q_primes),
                      delta_m, ctx.q_primes)
            c1 = _add(_poly_mul_rns(ctx, self.key.p1, u), e2, ctx.q_primes)
            return Ciphertext((c0, c1))
        # symmetric: fresh a per ciphertext
        a = np.stack([rng.integers(0, p, ctx.n) for p in ctx.q_primes]).astype(np.int64)
        e = _to_rns(ctx, _sample_error(rng, ctx.n))
        body = _add(_poly_mul_rns(ctx, a, self.key.data), e, ctx.q_primes)
        c0 = _add(_sub(np.zeros_like(body), body, ctx.q_primes), delta_m, ctx.q_primes)
        return Ciphertext((c0, a))


class Decryptor:
    """Reference ``decryptor.py``: evaluates the ciphertext polynomial
    at the secret key (any size, ``_get_sufficient_sk_power``) and
    rounds t/q * (...) to recover the plaintext."""

    def __init__(self, context: Context, secret_key: SecretKey):
        self.ctx = context
        self.sk = secret_key

    def decrypt(self, ct: Ciphertext) -> Plaintext:
        ctx = self.ctx
        acc = ct.parts[0].copy()
        s_pow = self.sk.data
        for part in ct.parts[1:]:
            acc = _add(acc, _poly_mul_rns(ctx, part, s_pow), ctx.q_primes)
            s_pow = _poly_mul_rns(ctx, s_pow, self.sk.data)
        coeffs = ctx.compose(acc, ctx.q_primes)  # centered bigints
        t, q = ctx.t, ctx.q
        vec = np.frompyfunc(
            lambda c: ((2 * t * int(c) + q) // (2 * q)) % t, 1, 1)(coeffs)
        return Plaintext(vec.astype(np.int64))

    def invariant_noise_budget(self, ct: Ciphertext) -> float:
        """Bits of noise budget left (SEAL-style diagnostic)."""
        ctx = self.ctx
        acc = ct.parts[0].copy()
        s_pow = self.sk.data
        for part in ct.parts[1:]:
            acc = _add(acc, _poly_mul_rns(ctx, part, s_pow), ctx.q_primes)
            s_pow = _poly_mul_rns(ctx, s_pow, self.sk.data)
        coeffs = ctx.compose(acc, ctx.q_primes)
        t, q = ctx.t, ctx.q
        noise = max(abs(int(t * int(c) - q * ((2 * t * int(c) + q) // (2 * q))))
                    for c in coeffs.ravel())
        return max(0.0, (q // 2).bit_length() - max(noise, 1).bit_length() - 1)


class Evaluator:
    """Reference ``evaluator.py``: add/sub/negate/mul on ciphertexts and
    plaintexts, plus relinearization."""

    def __init__(self, context: Context):
        self.ctx = context

    # -- additive ops

    def add(self, a, b):
        if isinstance(a, Plaintext) and isinstance(b, Plaintext):
            return Plaintext((a.data + b.data) % self.ctx.t)
        if isinstance(a, Plaintext):
            a, b = b, a
        if isinstance(b, Plaintext):
            return Ciphertext((self._add_plain_part(a.parts[0], b),) + a.parts[1:])
        n = max(len(a.parts), len(b.parts))
        parts = []
        for i in range(n):
            x = a.parts[i] if i < len(a.parts) else None
            y = b.parts[i] if i < len(b.parts) else None
            if x is None:
                parts.append(y)
            elif y is None:
                parts.append(x)
            else:
                parts.append(_add(x, y, self.ctx.q_primes))
        return Ciphertext(tuple(parts))

    def negate(self, ct: Ciphertext) -> Ciphertext:
        return Ciphertext(tuple(
            _sub(np.zeros_like(p), p, self.ctx.q_primes) for p in ct.parts))

    def sub(self, a, b):
        if isinstance(a, Plaintext) and isinstance(b, Plaintext):
            return Plaintext((a.data - b.data) % self.ctx.t)
        if isinstance(b, Plaintext):
            nb = Plaintext((-b.data) % self.ctx.t)
            return self.add(a, nb)
        return self.add(a, self.negate(b))

    def _add_plain_part(self, c0, pt: Plaintext):
        ctx = self.ctx
        dm = ctx.delta_mod[:, None] * (pt.data % ctx.t)[None, :] % np.array(
            ctx.q_primes, np.int64)[:, None]
        return _add(c0, dm, ctx.q_primes)

    # -- multiplicative ops

    def mul(self, a, b, relin_keys: Optional[RelinKeys] = None):
        if isinstance(a, Plaintext) and isinstance(b, Plaintext):
            ctx = self.ctx
            plan_t = self._plain_plan()
            prod = plan_t.inv(plan_t.fwd(a.data % ctx.t) * plan_t.fwd(b.data % ctx.t)
                              % ctx.t)
            return Plaintext(prod)
        if isinstance(a, Plaintext):
            a, b = b, a
        if isinstance(b, Plaintext):
            return self._mul_cipher_plain(a, b)
        out = self._mul_cipher_cipher(a, b)
        if relin_keys is not None:
            out = self.relin(out, relin_keys)
        return out

    def _plain_plan(self) -> _NttPlan:
        t = self.ctx.t
        if t not in self.ctx.plans:
            self.ctx.plans[t] = _NttPlan(self.ctx.n, t)
        return self.ctx.plans[t]

    def _mul_cipher_plain(self, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        ctx = self.ctx
        m = _to_rns(ctx, pt.data % ctx.t)
        return Ciphertext(tuple(_poly_mul_rns(ctx, p, m) for p in ct.parts))

    def _mul_cipher_cipher(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Exact tensor product in the extended basis, then the rounded
        t/q scale-down (reference ``_mul_cipher_cipher`` +
        ``rns_tool``)."""
        ctx = self.ctx
        if len(a.parts) != 2 or len(b.parts) != 2:
            raise ValueError("mul expects size-2 ciphertexts (relin first)")

        def lift(part):
            coeffs = ctx.compose(part, ctx.q_primes)
            return ctx.decompose(coeffs, ctx.ext_primes)

        a0, a1 = lift(a.parts[0]), lift(a.parts[1])
        b0, b1 = lift(b.parts[0]), lift(b.parts[1])
        pm = lambda x, y: _poly_mul_rns(ctx, x, y, ctx.ext_primes)
        e0 = pm(a0, b0)
        e1 = _add(pm(a0, b1), pm(a1, b0), ctx.ext_primes)
        e2 = pm(a1, b1)

        t, q = ctx.t, ctx.q

        def scale_down(e):
            coeffs = ctx.compose(e, ctx.ext_primes)
            scaled = np.frompyfunc(
                lambda c: (2 * t * int(c) + q) // (2 * q), 1, 1)(coeffs)
            return ctx.decompose(scaled, ctx.q_primes)

        return Ciphertext((scale_down(e0), scale_down(e1), scale_down(e2)))

    def relin(self, ct: Ciphertext, keys: RelinKeys) -> Ciphertext:
        """size 3 -> 2 via RNS gadget keyswitch (reference ``relin`` /
        ``_switch_key_inplace``)."""
        if len(ct.parts) == 2:
            return ct
        if len(ct.parts) != 3:
            raise ValueError("relin supports size-3 ciphertexts")
        ctx = self.ctx
        c0, c1, c2 = ct.parts
        for i, qi in enumerate(ctx.q_primes):
            # digit i = c2's residue mod q_i (an integer < q_i, hence
            # already reduced mod every limb prime), spread across limbs
            d = np.broadcast_to(c2[i], c2.shape).astype(np.int64)
            c0 = _add(c0, _poly_mul_rns(ctx, d, keys.r0[i]), ctx.q_primes)
            c1 = _add(c1, _poly_mul_rns(ctx, d, keys.r1[i]), ctx.q_primes)
        return Ciphertext((c0, c1))


# -------------------------------------------------------------- encoders

class IntegerEncoder:
    """Binary expansion encoder (reference ``integer_encoder.py``):
    an integer's bits become coefficients; decode evaluates at x=2."""

    def __init__(self, context: Context):
        self.ctx = context

    def encode(self, value: int) -> Plaintext:
        n, t = self.ctx.n, self.ctx.t
        coeffs = np.zeros(n, np.int64)
        v, sign = abs(int(value)), 1 if value >= 0 else -1
        if v.bit_length() > n:
            raise ValueError("integer too large for the polynomial degree")
        for i in range(v.bit_length()):
            if (v >> i) & 1:
                coeffs[i] = sign % t
        return Plaintext(coeffs)

    def decode(self, plain: Plaintext) -> int:
        t = self.ctx.t
        centered = np.where(plain.data > t // 2, plain.data - t, plain.data)
        return int(sum(int(c) << i for i, c in enumerate(centered)))


class BatchEncoder:
    """SIMD slot packing via the mod-t negacyclic NTT (t = 1 mod 2n).
    n integer slots per plaintext; slot-wise add/mul under the
    evaluator's ring ops. The reference's FV stack lacks this — it is
    the natural vectorized encoding for this rebuild."""

    def __init__(self, context: Context):
        self.ctx = context
        if (context.t - 1) % (2 * context.n):
            raise ValueError("plain modulus not NTT-friendly")
        self.plan = _NttPlan(context.n, context.t)

    def encode(self, values) -> Plaintext:
        v = np.zeros(self.ctx.n, np.int64)
        arr = np.asarray(values, np.int64) % self.ctx.t
        v[: arr.size] = arr
        return Plaintext(self.plan.inv(v))

    def decode(self, plain: Plaintext, count: Optional[int] = None) -> np.ndarray:
        slots = self.plan.fwd(plain.data % self.ctx.t)
        t = self.ctx.t
        slots = np.where(slots > t // 2, slots - t, slots)
        return slots[:count] if count else slots
