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
    keys_q: DcfKeys    # DCF at q = r mod 2^32
    keys_p: DcfKeys    # DCF at p = (r + 2^31) mod 2^32
    c: AShare          # (2, N) int64 shares of 1{p >= q}


def gen_compare(key, n: int) -> CompareKeys:
    """Dealer phase for a batch of n sign extractions."""
    k_r, k_q, k_p, k_sr, k_sc = jax.random.split(key, 5)
    r = S.rand_ring(k_r, (n,))
    q = r.astype(jnp.uint32)
    p = q + _HALF  # mod 2^32 automatic in uint32
    one = jnp.ones((n,), jnp.int64)
    keys_q = dcf_gen(k_q, q, one)
    keys_p = dcf_gen(k_p, p, one)
    c = (p >= q).astype(jnp.int64)
    return CompareKeys(S.share(k_sr, r), keys_q, keys_p, S.share(k_sc, c))


def msb(x: AShare, ck: CompareKeys) -> AShare:
    """Shares of 1{x < 0} for a flat (N,) sharing."""
    x_hat = S.reconstruct(S.add(x, ck.r)).astype(jnp.uint32)  # opening
    v0 = dcf_eval(0, ck.keys_q, x_hat) - dcf_eval(0, ck.keys_p, x_hat)
    v1 = dcf_eval(1, ck.keys_q, x_hat) - dcf_eval(1, ck.keys_p, x_hat)
    return AShare(jnp.stack([v0, v1]) + ck.c.data)


def sign_shares(key, x: AShare) -> AShare:
    """Dealer + online in one call: shares of 1{x < 0}, any shape."""
    flat = S.reshape(x, (-1,))
    ck = gen_compare(key, flat.shape[0])
    s = msb(flat, ck)
    return S.reshape(s, x.shape)
