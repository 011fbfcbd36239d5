"""Private comparison via DCF (the FSS online protocol).

Replaces the reference's AriaNN comparison (``syft/frameworks/torch/mpc/
fss.py:97-180``: mask_builder -> open masked value -> DIF eval) with the
cheapest known FSS sign gadget — ONE (n-1)-bit DCF key evaluated at ONE
public point per party, via the borrow identity:

    u = (x_hat - r) mod 2^32,   x_hat = (x + r) mod 2^32 opened
    msb(u) = msb(x_hat) XOR msb(r) XOR 1{low31(x_hat) < low31(r)}

(subtracting the low 31 bits borrows into bit 31 exactly when
``low31(x_hat) < low31(r)``). ``msb(x_hat)`` is public; ``msb(r)`` is
dealer-known, so the dealer folds it into the DCF payload
``beta = 1 - 2*msb(r)`` plus an additively-shared constant ``msb(r)``:

    e = msb(r) XOR w = msb(r) + (1 - 2*msb(r)) * w      (w = DCF eval)
    msb(u) = A XOR e = A + (1 - 2A) * e                 (A public)

Offline: ONE 31-bit DCF key at ``alpha = low31(r)`` + one shared bit.
Online: open x_hat (one psum over the party axis under SPMD), each
party evaluates its key share at ``low31(x_hat)`` — a 31-level PRG
walk, the only non-linear cost in the protocol. This is 4x less PRG
work per element than the textbook two-key interval formulation
(1 key + 1 point vs 2 keys + 2-point interval membership).

Like the reference, the comparison domain is 32-bit (``fss.py`` n=32):
correct whenever |x| < 2^31, which the fixed-point bounds guarantee.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from primia_tpu.mpc import shares as S
from primia_tpu.mpc.dcf import DcfKeys, dcf_eval, dcf_gen
from primia_tpu.mpc.shares import AShare

# plain int, NOT jnp.uint32(...): a module-level device constant would
# initialize the XLA backend at import time, which breaks callers that
# must run jax.distributed.initialize() first (parallel/multihost.py).
# The & sites cast per numpy promotion against the uint32 operands.
_LOW31 = np.uint32((1 << 31) - 1)
_N_BITS = 31


class CompareKeys(NamedTuple):
    r: AShare        # (2, N) int64 mask shares
    keys: DcfKeys    # ONE 31-bit DCF key batch at alpha = low31(r)
    c: AShare        # (2, N) int64 shares of msb(r mod 2^32)


def gen_compare(key, n: int) -> CompareKeys:
    """Dealer phase for a batch of n sign extractions."""
    k_r, k_q, k_sr, k_sc = jax.random.split(key, 4)
    r = S.rand_ring(k_r, (n,))
    r32 = r.astype(jnp.uint32)
    c = (r32 >> jnp.uint32(31)).astype(jnp.int64)       # msb(r)
    beta = jnp.int64(1) - jnp.int64(2) * c              # folds the XOR
    keys = dcf_gen(k_q, r32 & _LOW31, beta, n_bits=_N_BITS)
    return CompareKeys(S.share(k_sr, r), keys, S.share(k_sc, c))


def msb(x: AShare, ck: CompareKeys) -> AShare:
    """Shares of 1{x < 0} for a flat (N,) sharing.

    Both parties run as ONE mixed-party batched eval (2N lanes, one
    31-level scan): lane layout [party0 | party1], same key, same point."""
    n = x.shape[-1]
    x_hat = S.reconstruct(S.add(x, ck.r)).astype(jnp.uint32)  # opening
    a = (x_hat >> jnp.uint32(31)).astype(jnp.int64)           # public msb
    xp = x_hat & _LOW31
    xs = jnp.tile(xp, 2)  # (2N,)
    keys2 = DcfKeys(
        seeds=jnp.tile(ck.keys.seeds, (1, 2, 1)),
        s_cw=jnp.tile(ck.keys.s_cw, (1, 2, 1)),
        t_cw=jnp.tile(ck.keys.t_cw, (1, 2, 1)),
        v_cw=jnp.tile(ck.keys.v_cw, (1, 2)),
        last_cw=jnp.tile(ck.keys.last_cw, 2),
    )
    party_vec = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), n)
    w = dcf_eval(party_vec, keys2, xs, n_bits=_N_BITS)  # (2N,)
    e = jnp.stack([w[:n], w[n:]]) + ck.c.data           # shares of msb(r)^w
    # msb = A + (1-2A) e, public A applied per party (constant on party 1)
    s0 = a + (jnp.int64(1) - jnp.int64(2) * a) * e[0]
    s1 = (jnp.int64(1) - jnp.int64(2) * a) * e[1]
    return AShare(jnp.stack([s0, s1]))


def _use_pallas_dcf() -> bool:
    """Default-on fused Pallas kernel (measured 17 ns/elem on v5e vs
    169 ns for the XLA scan formulation — 9.7x; see ops/pallas_dcf.py).
    ``PRIMIA_PALLAS_DCF=0`` falls back to the lax.map tiled path."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("PRIMIA_PALLAS_DCF", "1") != "0")


def _sign_shares_fused(key, flat: AShare) -> AShare:
    """sign_shares via the fused Pallas DCF kernel: identical protocol,
    identical key-derivation splits (bit-exact vs gen_compare + msb)."""
    from primia_tpu.ops.pallas_dcf import dcf_sign_fused

    n = flat.shape[-1]
    k_r, k_q, k_sr, k_sc = jax.random.split(key, 4)  # = gen_compare's
    r = S.rand_ring(k_r, (n,))
    r32 = r.astype(jnp.uint32)
    c = r32 >> jnp.uint32(31)
    seeds = jax.random.bits(k_q, (2, n, 4), jnp.uint32)  # = dcf_gen's
    c_sh = S.share(k_sc, c.astype(jnp.int64))
    x_hat = S.reconstruct(S.add(flat, S.share(k_sr, r))).astype(jnp.uint32)
    a = (x_hat >> jnp.uint32(31)).astype(jnp.int64)
    w = dcf_sign_fused(seeds, r32 & _LOW31, c, x_hat & _LOW31)  # (2, n)
    e = w + c_sh.data
    lin = jnp.int64(1) - jnp.int64(2) * a
    return AShare(jnp.stack([a + lin * e[0], lin * e[1]]))


def sign_shares(key, x: AShare, tile: int = None) -> AShare:
    """Dealer + online in one call: shares of 1{x < 0}, any shape.

    On TPU this runs the fused Pallas kernel (gen + both-party eval in
    one pass, correction words never leave vector registers). The XLA
    fallback evaluates in fixed-size ``lax.map`` tiles: DCF key material
    is ~0.5 KB per element (31 levels of correction words), so a
    whole-ResNet-relu batch (tens of millions of elements) can neither
    be materialized nor compiled as one program — the exact ceiling the
    round-1 build hit at 224 px (the reference batches its keygen the
    same way for >50k values, ``fss.py:42-95``). Only one tile's keys
    are ever live; the map body compiles once.

    ``tile`` defaults to $PRIMIA_FSS_TILE or 2^16 elements (measured
    flat 2^16-2^19 on v5e — the walk is VPU-compute-bound, not
    launch-bound).
    """
    flat = S.reshape(x, (-1,))
    n = flat.shape[0]
    if _use_pallas_dcf():
        return S.reshape(_sign_shares_fused(key, flat), x.shape)
    if tile is None:
        import os

        tile = int(os.environ.get("PRIMIA_FSS_TILE", 1 << 16))
    if n <= tile:
        ck = gen_compare(key, n)
        return S.reshape(msb(flat, ck), x.shape)

    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    data = jnp.pad(flat.data, ((0, 0), (0, pad)))  # zero shares: sign(0)=0
    tiles = jnp.moveaxis(data.reshape(2, n_tiles, tile), 1, 0)  # (T, 2, tile)
    keys = jax.random.split(key, n_tiles)

    def per_tile(args):
        k, xt = args
        ck = gen_compare(k, tile)
        return msb(AShare(xt), ck).data  # (2, tile)

    out = jax.lax.map(per_tile, (keys, tiles))  # (T, 2, tile)
    out = jnp.moveaxis(out, 0, 1).reshape(2, n_tiles * tile)[:, :n]
    return S.reshape(AShare(out), x.shape)
