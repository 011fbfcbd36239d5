"""SecureNN-style private sign extraction (the ``snn`` protocol).

The reference ships two comparison protocols behind one dispatch
(``syft/frameworks/torch/mpc/__init__.py:4-39``): AriaNN FSS (default,
``fss.py``) and SecureNN (``securenn.py:23-778``). FSS exists to
minimize *online communication rounds* — it pays for its single round
with a 32-level PRG tree walk (~90k integer ops and ~600 B of key
material per compared element; the reference needs a native Rust SHA
loop just to make it feasible).

Under the TPU simulation the parties are mesh-colocated and a "round"
is just a data dependency inside one XLA program, so the SecureNN
trade — more rounds, ~500 integer ops and ~125 B of dealer material
per element — is the hardware-right default. The FSS path
(``primia_tpu.mpc.compare``) remains available and tested; both return
identical shares of ``1{x < 0}``.

Protocol (faithful to SecureNN's provider-assisted comparison,
``securenn.py:172-348``, recast for the dealer/opening style used by
our FSS path):

Let ``m = x mod 2^32`` (the reference's 32-bit comparison domain;
correct whenever ``|x| < 2^31``, which the fixed-point bounds
guarantee). Dealer draws ``r ~ U(Z_2^32)`` and deals:

- additive shares of ``r`` over ``Z_2^32``   (to open ``c = m + r``),
- shares over ``Z_67`` of the 31 low bits of ``r``,
- arithmetic ``Z_2^64`` shares of ``bit31(r)``,
- common masks ``s_i ~ U(Z_67*)`` (hidden from the provider),
- the provider's re-share randomness.

Online: open ``c = m + r mod 2^32`` (uniform — reveals nothing), then
from the subtraction ``m = c - r``:

    bit31(m) = bit31(c) XOR bit31(r) XOR borrow,
    borrow   = 1{ c mod 2^31  <  r mod 2^31 }

``borrow`` comes from the SecureNN bit circuit: with public bits
``c_i`` and shared bits ``r_i`` (MSB first),

    t_i = c_i - r_i + 1 + sum_{j<i} (c_j XOR r_j)   (mod 67)

is 0 at the first differing position iff ``r > c`` and nonzero
everywhere otherwise; parties mask their ``t`` shares with the common
``s_i`` and the provider announces (re-shares) ``any(t_i == 0)``.
The two XORs cost one elementwise Beaver product (the other operand is
public). Everything is vectorized over the flattened element batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import beaver
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.shares import AShare

N_BITS = 32  # comparison domain (reference fss.py n=32)
_P = 67      # small field for the bit circuit (SecureNN's p)


class SnnKeys(NamedTuple):
    r_sh: jnp.ndarray     # (2, N) uint32 — shares of the opening mask r
    rbits_sh: jnp.ndarray  # (2, N, 31) int32 — Z_67 shares of r's low bits
    b_r: AShare           # (2, N) int64 — arithmetic shares of bit31(r)
    s: jnp.ndarray        # (N, 31) int32 — common nonzero masks (Z_67*)
    u: jnp.ndarray        # (N,) int64 — provider's re-share randomness


def gen_sign(key, n: int) -> SnnKeys:
    """Dealer phase for a batch of n sign extractions."""
    k_r, k_r0, k_rb, k_br, k_s, k_u = jax.random.split(key, 6)
    r = jax.random.bits(k_r, (n,), jnp.uint32)
    r0 = jax.random.bits(k_r0, (n,), jnp.uint32)
    r_sh = jnp.stack([r0, r - r0])

    # low 31 bits, MSB first (i=0 is bit 30)
    shifts = jnp.arange(30, -1, -1, dtype=jnp.uint32)
    rbits = ((r[:, None] >> shifts[None, :]) & jnp.uint32(1)).astype(jnp.int32)
    rb0 = jax.random.randint(k_rb, (n, 31), 0, _P, jnp.int32)
    rbits_sh = jnp.stack([rb0, (rbits - rb0) % _P])

    b_r_val = (r >> jnp.uint32(31)).astype(jnp.int64)
    b_r = S.share(k_br, b_r_val)

    s = jax.random.randint(k_s, (n, 31), 1, _P, jnp.int32)
    u = S.rand_ring(k_u, (n,))
    return SnnKeys(r_sh, rbits_sh, b_r, s, u)


def msb(key, x: AShare, keys: SnnKeys) -> AShare:
    """Shares of 1{x < 0} for a flat (N,) sharing (|x| < 2^31)."""
    # open c = m + r mod 2^32 (each party adds its mask share locally)
    masked = x.data.astype(jnp.uint32) + keys.r_sh
    c = masked[0] + masked[1]  # public opening, uniform in Z_2^32

    shifts = jnp.arange(30, -1, -1, dtype=jnp.uint32)
    cbits = ((c[:, None] >> shifts[None, :]) & jnp.uint32(1)).astype(jnp.int32)
    b_c = (c >> jnp.uint32(31)).astype(jnp.int64)  # public bit31(c)

    # bit circuit in Z_67, share-wise (c public -> all linear):
    #   e_i = c_i XOR r_i = c_i + r_i - 2 c_i r_i
    #   t_i = c_i - r_i + 1 + prefix_i,  prefix_i = sum_{j<i} e_j
    rb = keys.rbits_sh  # (2, N, 31)
    e = cbits[None] * jnp.array([1, 0], jnp.int32)[:, None, None] \
        + rb - 2 * cbits[None] * rb
    prefix = jnp.cumsum(e, axis=-1) - e  # exclusive prefix (MSB first)
    t = (cbits[None] + 1) * jnp.array([1, 0], jnp.int32)[:, None, None] \
        - rb + prefix
    d = (t * keys.s[None]) % _P  # masked shares -> provider

    # provider: reconstruct, test for a zero anywhere, re-share in Z_2^64
    dv = (d[0] + d[1]) % _P
    beta = jnp.any(dv == 0, axis=-1).astype(jnp.int64)  # borrow = 1{c'<r'}
    borrow = AShare(jnp.stack([keys.u, beta - keys.u]))

    # msb = b_c XOR b_r XOR borrow; one Beaver product for b_r XOR borrow
    br_x_bw = beaver.mul(key, keys.b_r, borrow)
    B = S.add(S.add(keys.b_r, borrow), S.mul_public(br_x_bw, -2))
    out = S.add_public(S.mul_public(B, 1 - 2 * b_c), b_c)
    return out


def sign_shares(key, x: AShare) -> AShare:
    """Dealer + online in one call: shares of 1{x < 0}, any shape.
    Drop-in for ``compare.sign_shares`` (the FSS path)."""
    flat = S.reshape(x, (-1,))
    k_gen, k_mul = jax.random.split(key)
    keys = gen_sign(k_gen, flat.shape[0])
    s = msb(k_mul, flat, keys)
    return S.reshape(s, x.shape)
