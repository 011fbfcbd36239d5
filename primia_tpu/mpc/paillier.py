"""Paillier additively-homomorphic encryption.

Reference: ``syft/frameworks/torch/tensors/interpreters/paillier.py``
(PaillierTensor) wraps the ``phe`` pip package: keygen, per-element
encrypt/decrypt, ciphertext+ciphertext add, ciphertext x plaintext
multiply. This module is the self-contained equivalent (``phe`` is not
in this image): textbook Paillier with g = n + 1, Miller-Rabin keygen,
and a tensor wrapper that encodes floats through the same fixed-point
codec as the MPC engine (``mpc/fixed.py``).

Bignum modular exponentiation is host-side Python-int work by nature —
this is key-management / small-payload crypto, not a TPU hot path (the
reference never uses it in a shipped workload either; it exists as a
building block). Arrays cross to numpy object dtype at this boundary.
"""

from __future__ import annotations

import secrets
from typing import NamedTuple

import numpy as np

from primia_tpu.mpc import fixed

_SMALL_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]


def _is_probable_prime(n: int, rounds: int = 30) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = secrets.randbelow(n - 3) + 2
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


def _random_prime(bits: int) -> int:
    while True:
        c = secrets.randbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(c):
            return c


class PublicKey(NamedTuple):
    n: int

    @property
    def n_sq(self):
        return self.n * self.n

    def raw_encrypt(self, m: int) -> int:
        r = secrets.randbelow(self.n - 1) + 1
        # g = n + 1: g^m = 1 + m*n (mod n^2), no exponentiation needed
        return (1 + (m % self.n) * self.n) * pow(r, self.n, self.n_sq) % self.n_sq


class PrivateKey(NamedTuple):
    public: PublicKey
    lam: int  # lcm(p-1, q-1)
    mu: int  # (L(g^lam mod n^2))^-1 mod n

    def raw_decrypt(self, c: int) -> int:
        n = self.public.n
        l = (pow(c, self.lam, self.public.n_sq) - 1) // n
        m = l * self.mu % n
        return m - n if m > n // 2 else m  # centered: supports negatives


def keygen(bits: int = 1024) -> PrivateKey:
    """(reference: ``phe.paillier.generate_paillier_keypair``)"""
    while True:
        p = _random_prime(bits // 2)
        q = _random_prime(bits // 2)
        if p != q:
            break
    n = p * q
    lam = (p - 1) * (q - 1)  # fine since gcd(pq, (p-1)(q-1)) = 1
    mu = pow(lam, -1, n)  # with g = n+1: L(g^lam) = lam (mod n)
    return PrivateKey(PublicKey(n), lam, mu)


class PaillierTensor(NamedTuple):
    """Elementwise-encrypted array (numpy object dtype of ciphertext
    ints). Reference PaillierTensor op surface: +, -, * plaintext,
    encrypt/decrypt round trip through the fixed-point codec."""

    public: PublicKey
    data: np.ndarray  # object dtype, Python-int ciphertexts
    frac_bits: int

    def __add__(self, other):
        if isinstance(other, PaillierTensor):
            if other.public.n != self.public.n:
                raise ValueError("ciphertexts under different keys")
            nsq = self.public.n_sq
            out = np.frompyfunc(lambda a, b: a * b % nsq, 2, 1)(self.data, other.data)
            return self._replace(data=out)
        return self + encrypt(self.public, other, self.frac_bits)

    def __sub__(self, other):
        return self + (other * -1.0 if isinstance(other, PaillierTensor)
                       else -np.asarray(other))

    def __mul__(self, scalar):
        """ciphertext * plaintext integer scalar (Enc(m)^k = Enc(mk)).
        Floats are not rescaled here (stacked fixed-point scales need a
        decrypt); integer scalars keep the encoding exact."""
        k = int(scalar)
        nsq = self.public.n_sq
        out = np.frompyfunc(lambda c: pow(c, k % self.public.n, nsq), 1, 1)(self.data)
        return self._replace(data=out)

    @property
    def shape(self):
        return self.data.shape


def encrypt(pk: PublicKey, values, frac_bits: int = fixed.DEFAULT_FRAC_BITS) -> PaillierTensor:
    enc = np.asarray(np.round(np.asarray(values, np.float64) * (1 << frac_bits)),
                     np.int64)
    cts = np.frompyfunc(lambda m: pk.raw_encrypt(int(m)), 1, 1)(enc)
    return PaillierTensor(pk, np.asarray(cts, object), frac_bits)


def decrypt(sk: PrivateKey, t: PaillierTensor) -> np.ndarray:
    ms = np.frompyfunc(lambda c: sk.raw_decrypt(int(c)), 1, 1)(t.data)
    return np.asarray(ms, np.float64) / (1 << t.frac_bits)
