"""Fused DCF keygen + two-party eval — the FSS sign kernel.

The FSS comparison (``mpc/compare.py``, replacing the reference's
AriaNN protocol at ``syft/frameworks/torch/mpc/fss.py:97-245``) walks a
31-level PRG tree three times per element: once to GENERATE the key
(both parties' seeds, producing per-level correction words) and once
per party to EVALUATE it at the opened point. The XLA formulation
(``mpc/dcf.py``) runs these as separate ``lax.scan``s with the ~0.5 KB
of per-element correction words materialized in HBM between them, and
its (N, 4)-seed stacking costs relayouts every level.

This kernel fuses all three walks into ONE pass: the correction words
for level i are computed from the keygen state and consumed by both
parties' eval states in the same loop iteration — they live only in
vector registers, never in memory. Seed words are four separate
(rows, 128) u32 arrays (lane-major elements), so every Threefry round
is a plain full-width VPU op with no relayouts; the Z_{2^64} payload
ring runs in u32 limb pairs (TPU has no native 64-bit lanes).

Exactly seed-for-seed compatible with ``dcf_gen_from_seeds`` +
``dcf_eval`` (same Threefry-2x32-20 PRG, ``mpc/prg.py``), which is the
fallback path and the regression oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x64 weak-promotion inside the kernel would emit i64 vector ops Mosaic
# cannot lower (same dance as ops/pallas_clahe.py / pallas_tent.py)
from jax._src.config import enable_x64 as _x64_scope

from primia_tpu.mpc.prg import threefry2x32

_LANES = 128


# ------------------------------------------------------------ u32 limbs

def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(jnp.uint32)
    return (lo, a[1] + b[1] + carry)


def _neg64(a):
    return _add64((~a[0], ~a[1]), (jnp.uint32(1), jnp.uint32(0)))


def _sub64(a, b):
    return _add64(a, _neg64(b))


def _csel(bit, a, b):
    """bit==0 -> a, bit==1 -> b (mirrors mpc.dcf._sel)."""
    return jnp.where(bit == 0, a, b)


def _csel64(bit, a, b):
    return (_csel(bit, a[0], b[0]), _csel(bit, a[1], b[1]))


def _cneg64(bit, a):
    """bit==1 -> -a (the DCF sign_1 = (-1)^{t_1} factor)."""
    return _csel64(bit, a, _neg64(a))


def _expand(s0, s1, s2, s3):
    """G(s) on 4 seed-word planes — word-for-word ``mpc.prg.expand``:
    6 Threefry blocks under key (w0, w1), counters (w2 ^ c, w3);
    control bits are the LSBs of each child's first word (lambda=127)."""
    w = []
    for c in range(6):
        o0, o1 = threefry2x32(s0, s1, s2 ^ jnp.uint32(c), s3)
        w.append(o0)
        w.append(o1)
    one = jnp.uint32(1)
    tL = w[0] & one
    tR = w[4] & one
    m = ~one
    sL = (w[0] & m, w[1], w[2], w[3])
    sR = (w[4] & m, w[5], w[6], w[7])
    return sL, tL, (w[8], w[9]), sR, tR, (w[10], w[11])


def _expand_sel(s0, s1, s2, s3, xb):
    """Selected-child G(s): ONLY the xb-side seed and payload blocks.

    The eval walk never touches the off-path child, and the block
    counters are data (``s2 ^ c``), so the selection moves INTO the
    counter: 3 Threefry blocks instead of 6. Word-for-word equal to
    the xb-side half of ``_expand``."""
    one = jnp.uint32(1)
    c0 = xb + xb  # 0 -> blocks 0,1,4 (left); 1 -> blocks 2,3,5 (right)
    a0, a1 = threefry2x32(s0, s1, s2 ^ c0, s3)
    a2, a3 = threefry2x32(s0, s1, s2 ^ (c0 | one), s3)
    p0, p1 = threefry2x32(s0, s1, s2 ^ (jnp.uint32(4) | xb), s3)
    return (a0 & ~one, a1, a2, a3), a0 & one, (p0, p1)


def _xor_masked(words, cw, t):
    """words ^= cw where t==1 (t is a 0/1 u32 plane)."""
    mask = jnp.uint32(0) - t
    return tuple(wd ^ (c & mask) for wd, c in zip(words, cw))


# ------------------------------------------------------------ the kernel

def _sign_kernel(seeds_ref, alpha_ref, c_ref, x_ref, out_ref, *, n_bits):
    alpha = alpha_ref[...]          # (R, 128) u32, n_bits-bit DCF point
    x = x_ref[...]                  # (R, 128) u32, public eval point
    csel = c_ref[...]               # (R, 128) u32 0/1: payload = 1 - 2c
    zero = jnp.zeros_like(alpha)
    one = jnp.uint32(1)
    ones = zero + one

    beta = _csel64(csel, (ones, zero), (~zero, ~zero))  # +1 or -1

    # keygen state (party seeds g, control bits t, v_alpha accumulator).
    # Eval state rides the gen state on the common alpha/x prefix
    # (e_b == g_b level-for-level there — identical update rules), and
    # after the paths diverge BOTH parties' eval states are provably
    # equal (the lose-side correction s_cw = s_lose0 ^ s_lose1 maps
    # whichever party applies it onto the other's raw child, and
    # t0 ^ t1 == 1 on-path), so ONE merged walk (em, tem) serves both.
    # Net: 12 + 3 Threefry blocks per level instead of the naive 24 —
    # bit-identical output, pure redundancy elimination.
    g0 = tuple(seeds_ref[i] for i in range(4))
    g1 = tuple(seeds_ref[4 + i] for i in range(4))
    state = (
        g0, g1, zero, ones, (zero, zero),  # gen: g0 g1 t0 t1 v_alpha
        zero, g0, zero,                    # div flag, merged seed em, tem
        (zero, zero), (zero, zero),        # output accumulators v0, v1
    )

    def level(i, st):
        g0, g1, t0, t1, va, div, em, tem, v0, v1 = st
        sh = jnp.uint32(n_bits - 1) - i.astype(jnp.uint32)
        ab = (alpha >> sh) & one
        xb = (x >> sh) & one
        t0p, t1p = t0, t1  # pre-update bits = on-prefix eval bits

        # ---- keygen step (mpc/dcf.py dcf_gen level, limb arithmetic)
        sL0, tL0, vL0, sR0, tR0, vR0 = _expand(*g0)
        sL1, tL1, vL1, sR1, tR1, vR1 = _expand(*g1)
        # ab==0 -> lose = R, keep = L
        v_lose0 = _csel64(ab, vR0, vL0)
        v_lose1 = _csel64(ab, vR1, vL1)
        v_keep0 = _csel64(ab, vL0, vR0)
        v_keep1 = _csel64(ab, vL1, vR1)
        d = _sub64(_sub64(v_lose1, v_lose0), va)
        d = _csel64(ab, d, _add64(d, beta))      # +beta on the ab==1 side
        v_cw = _cneg64(t1, d)                    # sign_1 * d
        # v_alpha += -v_keep1 + v_keep0 + sign_1*v_cw; sign_1*v_cw == d
        va = _add64(_add64(_sub64(va, v_keep1), v_keep0), d)

        s_lose0 = tuple(_csel(ab, r, l) for r, l in zip(sR0, sL0))
        s_lose1 = tuple(_csel(ab, r, l) for r, l in zip(sR1, sL1))
        s_cw = tuple(a ^ b for a, b in zip(s_lose0, s_lose1))
        t_cw_L = tL0 ^ tL1 ^ ab ^ one
        t_cw_R = tR0 ^ tR1 ^ ab
        t_cw_keep = _csel(ab, t_cw_L, t_cw_R)

        g0 = _xor_masked(tuple(_csel(ab, l, r) for l, r in zip(sL0, sR0)),
                         s_cw, t0)
        g1 = _xor_masked(tuple(_csel(ab, l, r) for l, r in zip(sL1, sR1)),
                         s_cw, t1)
        t0 = _csel(ab, tL0, tR0) ^ (t0 & t_cw_keep)
        t1 = _csel(ab, tL1, tR1) ^ (t1 & t_cw_keep)

        # ---- eval step, both parties (mpc/dcf.py dcf_eval level)
        t_cw_sel = _csel(xb, t_cw_L, t_cw_R)

        # on the common prefix: e_b == g_b, reuse gen's expands outright
        vh0 = _csel64(xb, vL0, vR0)
        vh0 = _csel64(t0p, vh0, _add64(vh0, v_cw))
        vh1 = _csel64(xb, vL1, vR1)
        vh1 = _csel64(t1p, vh1, _add64(vh1, v_cw))

        # post-divergence: one selected-child expand serves both parties
        sm, tm, vm = _expand_sel(*em, xb)
        smc = _xor_masked(sm, s_cw, tem)
        tmc = tm ^ (tem & t_cw_sel)
        vhm = _csel64(tem, vm, _add64(vm, v_cw))

        vh0 = _csel64(div, vh0, vhm)
        vh1 = _csel64(div, vh1, vhm)
        v0 = _add64(v0, vh0)
        v1 = _sub64(v1, vh1)

        # merged-state update: entering divergence it is built from the
        # gen step's xb-side (= lose-side) children — party 0's
        # corrected child, which equals party 1's; afterwards it walks
        # itself. While still on the prefix the slot holds garbage that
        # is never read (every consumer above is gated on div).
        x_lose0 = tuple(_csel(xb, l, r) for l, r in zip(sL0, sR0))
        x_lose1 = tuple(_csel(xb, l, r) for l, r in zip(sL1, sR1))
        em_enter = tuple(_csel(t0p, a, b) for a, b in zip(x_lose0, x_lose1))
        tem_enter = _csel(xb, tL0, tR0) ^ (t0p & t_cw_sel)
        em = tuple(_csel(div, e, c) for e, c in zip(em_enter, smc))
        tem = _csel(div, tem_enter, tmc)
        div = div | (xb ^ ab)
        return (g0, g1, t0, t1, va, div, em, tem, v0, v1)

    (g0, g1, t0, t1, va,
     div, em, tem, v0, v1) = jax.lax.fori_loop(0, n_bits, level, state)

    # last_cw = sign_1 * (convert(s1) - convert(s0) - v_alpha)
    last = _cneg64(t1, _sub64(_sub64((g1[0], g1[1]), (g0[0], g0[1])), va))
    # never diverged (x == alpha): final eval state is the gen state
    fm = _csel64(tem, (em[0], em[1]), _add64((em[0], em[1]), last))
    f0 = _csel64(t0, (g0[0], g0[1]), _add64((g0[0], g0[1]), last))
    f1 = _csel64(t1, (g1[0], g1[1]), _add64((g1[0], g1[1]), last))
    v0 = _add64(v0, _csel64(div, f0, fm))
    v1 = _sub64(v1, _csel64(div, f1, fm))

    out_ref[0] = v0[0]
    out_ref[1] = v0[1]
    out_ref[2] = v1[0]
    out_ref[3] = v1[1]


@functools.partial(jax.jit,
                   static_argnames=("n_bits", "block_rows", "interpret"))
def dcf_sign_fused(seeds: jnp.ndarray, alpha: jnp.ndarray, c: jnp.ndarray,
                   x: jnp.ndarray, *, n_bits: int = 31,
                   block_rows: int = 32,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused DCF gen + both-party eval: returns (2, N) int64 shares with

        share[0] + share[1]  ==  (1 - 2c) * 1{x < alpha}   (mod 2^64)

    seeds: (2, N, 4) u32 root seeds (party 0 / party 1); alpha, x: (N,)
    u32 ``n_bits``-bit points; c: (N,) u32 0/1 payload-sign select.
    Bit-identical to ``dcf_gen_from_seeds`` + ``dcf_eval`` at both
    parties (the CPU/fallback path).
    """
    n = alpha.shape[0]
    block = block_rows * _LANES
    np_ = -(-n // block) * block
    pad = np_ - n

    def pad1(a):
        return jnp.pad(a, (0, pad)) if pad else a

    with _x64_scope(False):
        alpha_p = pad1(jnp.asarray(alpha, jnp.uint32)).reshape(-1, _LANES)
        x_p = pad1(jnp.asarray(x, jnp.uint32)).reshape(-1, _LANES)
        c_p = pad1(jnp.asarray(c, jnp.uint32)).reshape(-1, _LANES)
        # (2, N, 4) -> (8, rows, 128): one lane-major plane per seed word
        sd = jnp.moveaxis(jnp.asarray(seeds, jnp.uint32), -1, 1)  # (2,4,N)
        sd = sd.reshape(8, n)
        if pad:
            sd = jnp.pad(sd, ((0, 0), (0, pad)))
        sd = sd.reshape(8, -1, _LANES)
        rows = np_ // _LANES
        grid = (rows // block_rows,)
        kernel = functools.partial(_sign_kernel, n_bits=n_bits)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, block_rows, _LANES), lambda k: (0, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, _LANES), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, _LANES), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, _LANES), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, block_rows, _LANES),
                                   lambda k: (0, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, rows, _LANES), jnp.uint32),
            interpret=interpret,
        )(sd, alpha_p, c_p, x_p)
    # limb -> ring, outside the x64-off scope
    out = out.reshape(4, np_)[:, :n].astype(jnp.uint64)
    v0 = (out[0] | (out[1] << jnp.uint64(32))).astype(jnp.int64)
    v1 = (out[2] | (out[3] << jnp.uint64(32))).astype(jnp.int64)
    return jnp.stack([v0, v1])
