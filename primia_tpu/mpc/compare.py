"""Private comparison via DCF (the FSS online protocol).

Replaces the reference's AriaNN comparison (``syft/frameworks/torch/mpc/
fss.py:97-180``: mask_builder -> open masked value -> DIF eval). The
protocol here computes additive shares of the **sign bit** of a shared
ring value:

Offline (dealer): random mask r in Z_{2^64}, shared; DCF keys at
``q = r mod 2^32`` and ``p = (r + 2^31) mod 2^32``; shared constant
``c = 1{p >= q}``.

Online: parties open ``x_hat = (x + r) mod 2^32`` (uniformly random —
reveals nothing), then locally evaluate

    msb(x mod 2^32) = 1{x_hat in cyclic [p, q)}
                    = DCF_q(x_hat) - DCF_p(x_hat) + c

Like the reference, the comparison domain is 32-bit (``fss.py`` n=32):
correct whenever |x| < 2^31, which the fixed-point bounds guarantee.
One communication round (the opening), everything else local — ideal
under SPMD, where the opening is one psum over the party axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import shares as S
from primia_tpu.mpc.dcf import DcfKeys, dcf_eval, dcf_gen
from primia_tpu.mpc.shares import AShare

_HALF = jnp.uint32(1 << 31)


class CompareKeys(NamedTuple):
    r: AShare          # (2, N) int64 mask shares
    keys_qp: DcfKeys   # ONE DCF key batch over concat(q, p):
                       #   q = r mod 2^32, p = (r + 2^31) mod 2^32
    c: AShare          # (2, N) int64 shares of 1{p >= q}


def gen_compare(key, n: int) -> CompareKeys:
    """Dealer phase for a batch of n sign extractions.

    Both DCF instances (at q and at p) are generated as ONE batch of 2n
    keys — a single 32-level scan instead of two (fewer, larger kernels
    for both compile time and TPU utilization)."""
    k_r, k_qp, k_sr, k_sc = jax.random.split(key, 4)
    r = S.rand_ring(k_r, (n,))
    q = r.astype(jnp.uint32)
    p = q + _HALF  # mod 2^32 automatic in uint32
    ones = jnp.ones((2 * n,), jnp.int64)
    keys_qp = dcf_gen(k_qp, jnp.concatenate([q, p]), ones)
    c = (p >= q).astype(jnp.int64)
    return CompareKeys(S.share(k_sr, r), keys_qp, S.share(k_sc, c))


def msb(x: AShare, ck: CompareKeys) -> AShare:
    """Shares of 1{x < 0} for a flat (N,) sharing.

    Both parties x both DCF points run as ONE mixed-party batched eval
    (4N lanes, one scan): lane layout [party0|party1] x [q|p]."""
    n = x.shape[-1]
    x_hat = S.reconstruct(S.add(x, ck.r)).astype(jnp.uint32)  # opening
    xs = jnp.tile(x_hat, 4)                      # (4N,)
    # tile each key field's batch axis (2n -> 4n). Key layout per field:
    #   seeds (2, 2n, 4); s_cw (nbits, 2n, 4); t_cw (nbits, 2n, 2);
    #   v_cw (nbits, 2n); last_cw (2n,)
    keys4 = DcfKeys(
        seeds=jnp.tile(ck.keys_qp.seeds, (1, 2, 1)),
        s_cw=jnp.tile(ck.keys_qp.s_cw, (1, 2, 1)),
        t_cw=jnp.tile(ck.keys_qp.t_cw, (1, 2, 1)),
        v_cw=jnp.tile(ck.keys_qp.v_cw, (1, 2)),
        last_cw=jnp.tile(ck.keys_qp.last_cw, 2),
    )
    party_vec = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), 2 * n)
    v = dcf_eval(party_vec, keys4, xs)           # (4N,)
    vq0, vp0, vq1, vp1 = v[:n], v[n : 2 * n], v[2 * n : 3 * n], v[3 * n :]
    return AShare(jnp.stack([vq0 - vp0, vq1 - vp1]) + ck.c.data)


def sign_shares(key, x: AShare, tile: int = None) -> AShare:
    """Dealer + online in one call: shares of 1{x < 0}, any shape.

    Large batches are evaluated in fixed-size tiles via ``lax.map``:
    DCF key material is ~1 KB per element (32 levels of correction
    words), so a whole-ResNet-relu batch (tens of millions of elements)
    can neither be materialized nor compiled as one program — the exact
    ceiling the round-1 build hit at 224 px (the reference batches its
    keygen the same way for >50k values, ``fss.py:42-95``). Only one
    tile's keys are ever live; the map body compiles once.

    ``tile`` defaults to $PRIMIA_FSS_TILE or 2^16 elements (~140 MB of
    transient key material per tile).
    """
    if tile is None:
        import os

        tile = int(os.environ.get("PRIMIA_FSS_TILE", 1 << 16))
    flat = S.reshape(x, (-1,))
    n = flat.shape[0]
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
