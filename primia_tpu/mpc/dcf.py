"""Function secret sharing: DPF (point / equality) and DCF (comparison).

Replaces the reference's ``syft/frameworks/torch/mpc/fss.py`` (AriaNN
DPF/DIF with SHA-based PRG via the Rust ``shaloop``). Implemented from
the published constructions (Boyle-Gilboa-Ishai: DPF from "Function
Secret Sharing: Improvements and Extensions" 2016; DCF from "Function
Secret Sharing for Mixed-Mode and Fixed-Point Secure Computation" 2020)
with a Threefry-based PRG (``primia_tpu.mpc.prg``) — the PRG choice is
internal; only share correctness is observable.

Domain: n-bit unsigned inputs (default n=32, matching the reference's
comparison domain); payload group: Z_{2^64} (int64 with wraparound).

Everything is vectorized over a batch of N independent keys/points and
jit-traceable; eval walks the n levels with ``lax.scan`` — a
TPU-friendly shape (per level: one PRG pass over (N, 4) u32 lanes).

Key layout (batch N, domain n):
    seeds:    (2, N, 4) u32   per-party root seeds
    s_cw:     (n, N, 4) u32   seed correction words
    t_cw:     (n, N, 2) u32   control-bit corrections (L, R)
    v_cw:     (n, N)    i64   value corrections (DCF only)
    last_cw:  (N,)      i64   final output correction
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc.prg import expand, words_to_ring

N_BITS_DEFAULT = 32


class DcfKeys(NamedTuple):
    seeds: jnp.ndarray
    s_cw: jnp.ndarray
    t_cw: jnp.ndarray
    v_cw: jnp.ndarray
    last_cw: jnp.ndarray


class DpfKeys(NamedTuple):
    seeds: jnp.ndarray
    s_cw: jnp.ndarray
    t_cw: jnp.ndarray
    last_cw: jnp.ndarray


def _alpha_bit(alpha, i: int, n_bits: int):
    """i-th bit of alpha, MSB first (i=0 is the top bit), as u32 0/1."""
    return (alpha >> jnp.uint32(n_bits - 1 - i)) & jnp.uint32(1)


def _sel(bit, a, b):
    """bit==0 -> a, bit==1 -> b (elementwise, bit broadcast over trailing)."""
    while bit.ndim < a.ndim:
        bit = bit[..., None]
    return jnp.where(bit == 0, a, b)


# ====================================================================== DCF

def dcf_gen(key, alpha, beta, n_bits: int = N_BITS_DEFAULT) -> DcfKeys:
    """Generate DCF keys for f(x) = beta * 1{x < alpha} (unsigned n-bit).

    alpha: (N,) uint32; beta: (N,) int64. Dealer-side (crypto provider).
    """
    N = jnp.asarray(alpha).shape[0]
    seeds = jax.random.bits(key, (2, N, 4), jnp.uint32)
    return dcf_gen_from_seeds(seeds, alpha, beta, n_bits=n_bits)


def dcf_gen_from_seeds(seeds, alpha, beta,
                       n_bits: int = N_BITS_DEFAULT) -> DcfKeys:
    """``dcf_gen`` with explicit (2, N, 4) uint32 root seeds — the split
    point the fused Pallas kernel (``ops/pallas_dcf.py``) shares with
    this reference implementation, so both can be tested seed-for-seed."""
    alpha = jnp.asarray(alpha, jnp.uint32)
    beta = jnp.asarray(beta, jnp.int64)
    N = alpha.shape[0]

    abits = jnp.stack(
        [_alpha_bit(alpha, i, n_bits) for i in range(n_bits)]
    )  # (n, N)

    def level(carry, a):
        s0, s1, t0, t1, v_alpha = carry
        sL0, tL0, vL0, sR0, tR0, vR0 = expand(s0)
        sL1, tL1, vL1, sR1, tR1, vR1 = expand(s1)
        # keep = R if a==1 else L

        s_lose0 = _sel(a, sR0, sL0)  # a==0 -> lose = R ; a==1 -> lose = L
        s_lose1 = _sel(a, sR1, sL1)
        v_lose0 = words_to_ring(_sel(a, vR0, vL0))
        v_lose1 = words_to_ring(_sel(a, vR1, vL1))
        v_keep0 = words_to_ring(_sel(a, vL0, vR0))
        v_keep1 = words_to_ring(_sel(a, vL1, vR1))

        sign1 = jnp.where(t1 == 1, jnp.int64(-1), jnp.int64(1))
        v_cw = sign1 * (v_lose1 - v_lose0 - v_alpha)
        # when alpha_i == 1 the Lose branch is L: x with x_i==0 < alpha
        v_cw = v_cw + jnp.where(a == 1, sign1 * beta, jnp.int64(0))
        v_alpha = v_alpha - v_keep1 + v_keep0 + sign1 * v_cw

        s_cw = s_lose0 ^ s_lose1
        t_cw_L = tL0 ^ tL1 ^ a ^ jnp.uint32(1)
        t_cw_R = tR0 ^ tR1 ^ a

        s_keep0 = _sel(a, sL0, sR0)
        s_keep1 = _sel(a, sL1, sR1)
        t_keep0 = _sel(a, tL0, tR0)
        t_keep1 = _sel(a, tL1, tR1)
        t_cw_keep = _sel(a, t_cw_L, t_cw_R)

        s0 = s_keep0 ^ _sel(jnp.uint32(1) - t0, s_cw, jnp.zeros_like(s_cw))
        s1 = s_keep1 ^ _sel(jnp.uint32(1) - t1, s_cw, jnp.zeros_like(s_cw))
        t0 = t_keep0 ^ (t0 * t_cw_keep)
        t1 = t_keep1 ^ (t1 * t_cw_keep)

        out = (s_cw, jnp.stack([t_cw_L, t_cw_R], axis=-1), v_cw)
        return (s0, s1, t0, t1, v_alpha), out

    carry0 = (
        seeds[0],
        seeds[1],
        jnp.zeros((N,), jnp.uint32),
        jnp.ones((N,), jnp.uint32),
        jnp.zeros((N,), jnp.int64),
    )
    (s0, s1, t0, t1, v_alpha), (s_cw, t_cw, v_cw) = jax.lax.scan(
        level, carry0, abits
    )

    sign1 = jnp.where(t1 == 1, jnp.int64(-1), jnp.int64(1))
    conv0 = words_to_ring(s0[..., :2])
    conv1 = words_to_ring(s1[..., :2])
    last_cw = sign1 * (conv1 - conv0 - v_alpha)

    return DcfKeys(seeds=seeds, s_cw=s_cw, t_cw=t_cw, v_cw=v_cw, last_cw=last_cw)


def dcf_eval(party, keys: DcfKeys, x, n_bits: int = N_BITS_DEFAULT):
    """Party b's additive share of beta * 1{x < alpha}; x: (N,) uint32.

    ``party`` is a Python int (0/1) or a (N,) array of 0/1 — the array
    form evaluates a mixed-party batch in ONE scan (used to fuse both
    parties' online evals into a single kernel)."""
    x = jnp.asarray(x, jnp.uint32)
    N = x.shape[0]
    if isinstance(party, int):
        party_u = jnp.full((N,), jnp.uint32(party))
        sign_b = jnp.int64(1 - 2 * party)
    else:
        party_u = jnp.asarray(party, jnp.uint32)
        sign_b = (1 - 2 * party_u.astype(jnp.int64))

    def level(carry, inputs):
        s, t, v = carry
        s_cw, t_cw, v_cw, xbit = inputs
        sL, tL, vL, sR, tR, vR = expand(s)
        tmask = t  # (N,) u32 0/1
        sL = sL ^ _sel(jnp.uint32(1) - tmask, s_cw, jnp.zeros_like(s_cw))
        sR = sR ^ _sel(jnp.uint32(1) - tmask, s_cw, jnp.zeros_like(s_cw))
        tL = tL ^ (tmask * t_cw[..., 0])
        tR = tR ^ (tmask * t_cw[..., 1])
        v_here = jnp.where(
            xbit == 0, words_to_ring(vL), words_to_ring(vR)
        ) + tmask.astype(jnp.int64) * v_cw
        v = v + sign_b * v_here
        s = _sel(xbit, sL, sR)
        t = jnp.where(xbit == 0, tL, tR)
        return (s, t, v), None

    xbits = jnp.stack(
        [_alpha_bit(x, i, n_bits) for i in range(n_bits)]
    )  # (n, N)
    if isinstance(party, int):
        s0 = keys.seeds[party]
    else:
        s0 = _sel(party_u, keys.seeds[0], keys.seeds[1])
    t0 = party_u
    v0 = jnp.zeros((N,), jnp.int64)
    (s, t, v), _ = jax.lax.scan(
        level, (s0, t0, v0), (keys.s_cw, keys.t_cw, keys.v_cw, xbits)
    )
    v = v + sign_b * (
        words_to_ring(s[..., :2]) + t.astype(jnp.int64) * keys.last_cw
    )
    return v


# ====================================================================== DPF

def dpf_gen(key, alpha, beta, n_bits: int = N_BITS_DEFAULT) -> DpfKeys:
    """Generate DPF keys for f(x) = beta * 1{x == alpha}."""
    alpha = jnp.asarray(alpha, jnp.uint32)
    beta = jnp.asarray(beta, jnp.int64)
    N = alpha.shape[0]
    seeds = jax.random.bits(key, (2, N, 4), jnp.uint32)

    abits = jnp.stack([_alpha_bit(alpha, i, n_bits) for i in range(n_bits)])

    def level(carry, a):
        s0, s1, t0, t1 = carry
        sL0, tL0, _, sR0, tR0, _ = expand(s0)
        sL1, tL1, _, sR1, tR1, _ = expand(s1)

        s_lose0 = _sel(a, sR0, sL0)
        s_lose1 = _sel(a, sR1, sL1)
        s_cw = s_lose0 ^ s_lose1
        t_cw_L = tL0 ^ tL1 ^ a ^ jnp.uint32(1)
        t_cw_R = tR0 ^ tR1 ^ a

        s_keep0 = _sel(a, sL0, sR0)
        s_keep1 = _sel(a, sL1, sR1)
        t_keep0 = _sel(a, tL0, tR0)
        t_keep1 = _sel(a, tL1, tR1)
        t_cw_keep = _sel(a, t_cw_L, t_cw_R)

        s0 = s_keep0 ^ _sel(jnp.uint32(1) - t0, s_cw, jnp.zeros_like(s_cw))
        s1 = s_keep1 ^ _sel(jnp.uint32(1) - t1, s_cw, jnp.zeros_like(s_cw))
        t0 = t_keep0 ^ (t0 * t_cw_keep)
        t1 = t_keep1 ^ (t1 * t_cw_keep)

        return (s0, s1, t0, t1), (s_cw, jnp.stack([t_cw_L, t_cw_R], axis=-1))

    carry0 = (
        seeds[0],
        seeds[1],
        jnp.zeros((N,), jnp.uint32),
        jnp.ones((N,), jnp.uint32),
    )
    (s0, s1, t0, t1), (s_cw, t_cw) = jax.lax.scan(level, carry0, abits)

    sign1 = jnp.where(t1 == 1, jnp.int64(-1), jnp.int64(1))
    conv0 = words_to_ring(s0[..., :2])
    conv1 = words_to_ring(s1[..., :2])
    last_cw = sign1 * (beta + conv1 - conv0)

    return DpfKeys(seeds=seeds, s_cw=s_cw, t_cw=t_cw, last_cw=last_cw)


def dpf_eval(party: int, keys: DpfKeys, x, n_bits: int = N_BITS_DEFAULT):
    """Party b's additive share of beta * 1{x == alpha}."""
    x = jnp.asarray(x, jnp.uint32)
    N = x.shape[0]
    sign_b = jnp.int64(1) if party == 0 else jnp.int64(-1)

    def level(carry, inputs):
        s, t = carry
        s_cw, t_cw, xbit = inputs
        sL, tL, _, sR, tR, _ = expand(s)
        sL = sL ^ _sel(jnp.uint32(1) - t, s_cw, jnp.zeros_like(s_cw))
        sR = sR ^ _sel(jnp.uint32(1) - t, s_cw, jnp.zeros_like(s_cw))
        tL = tL ^ (t * t_cw[..., 0])
        tR = tR ^ (t * t_cw[..., 1])
        s = _sel(xbit, sL, sR)
        t = jnp.where(xbit == 0, tL, tR)
        return (s, t), None

    xbits = jnp.stack([_alpha_bit(x, i, n_bits) for i in range(n_bits)])
    s0 = keys.seeds[party]
    t0 = jnp.full((N,), jnp.uint32(party))
    (s, t), _ = jax.lax.scan(level, (s0, t0), (keys.s_cw, keys.t_cw, xbits))
    return sign_b * (words_to_ring(s[..., :2]) + t.astype(jnp.int64) * keys.last_cw)
