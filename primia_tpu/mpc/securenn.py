"""SecureNN protocol suite (the ``snn`` backend).

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

Sign protocol (faithful to SecureNN's provider-assisted comparison,
``securenn.py:172-348``, recast for the dealer/opening style used by
our FSS path):

Let ``m = x mod 2^n`` (n = 32 default, the reference's comparison
domain; correct whenever ``|x| < 2^(n-1)``, which the fixed-point
bounds guarantee; ``n = 64`` is used by :func:`division`, whose
intermediate magnitudes exceed 2^31). Dealer draws ``r ~ U(Z_2^n)``
and deals:

- additive shares of ``r`` over ``Z_2^n``   (to open ``c = m + r``),
- shares over ``Z_67`` of the n-1 low bits of ``r``,
- arithmetic ``Z_2^64`` shares of ``bit_{n-1}(r)``,
- common masks ``s_i ~ U(Z_67*)`` (hidden from the provider),
- the provider's re-share randomness.

Online: open ``c = m + r mod 2^n`` (uniform — reveals nothing), then
from the subtraction ``m = c - r``:

    bit_{n-1}(m) = bit_{n-1}(c) XOR bit_{n-1}(r) XOR borrow,
    borrow      = 1{ c mod 2^(n-1)  <  r mod 2^(n-1) }

``borrow`` comes from the SecureNN bit circuit: with public bits
``c_i`` and shared bits ``r_i`` (MSB first),

    t_i = c_i - r_i + 1 + sum_{j<i} (c_j XOR r_j)   (mod 67)

is 0 at the first differing position iff ``r > c`` and nonzero
everywhere otherwise; parties mask their ``t`` shares with the common
``s_i`` and the provider announces (re-shares) ``any(t_i == 0)``.
The two XORs cost one elementwise Beaver product (the other operand is
public). Everything is vectorized over the flattened element batch.
(Z_67 holds up to 63 circuit bits: prefix sums reach at most 62+2 < 67.)

This module also completes the reference's SecureNN surface:
:func:`select_share` (``securenn.py:137-170``), :func:`share_convert`
(``securenn.py:372-480`` — upstream the real protocol is commented out
and degenerates to re-randomization; here it is implemented), and
private integer :func:`division` (``securenn.py:553-608``).
``maxpool``/``maxpool_deriv`` (``securenn.py:611-710``) live in
``mpc.functions`` as fixed-round one-hot argmax instead of the
reference's O(n)-round sequential scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import beaver
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.shares import AShare

N_BITS = 32  # default comparison domain (reference fss.py n=32)
_P = 67      # small field for the bit circuit (SecureNN's p)

# Z_{2^64 - 1}: the reference's "field L - 1" for share_convert
M_RING = jnp.uint64(0xFFFFFFFFFFFFFFFF)  # 2^64 - 1


def _udt(n_bits: int):
    return jnp.uint32 if n_bits == 32 else jnp.uint64


class SnnKeys(NamedTuple):
    r_sh: jnp.ndarray      # (2, N) uint — shares of the opening mask r
    rbits_sh: jnp.ndarray  # (2, N, n-1) int32 — Z_67 shares of r's low bits
    b_r: AShare            # (2, N) int64 — arithmetic shares of bit_{n-1}(r)
    s: jnp.ndarray         # (N, n-1) int32 — common nonzero masks (Z_67*)
    u: jnp.ndarray         # (N,) int64 — provider's re-share randomness


def _decompose(v, nb: int):
    """Public bit decomposition, MSB first: (N,) uint -> (N, nb) int32."""
    shifts = jnp.arange(nb - 1, -1, -1, dtype=v.dtype)
    return ((v[:, None] >> shifts[None, :]) & v.dtype.type(1)).astype(jnp.int32)


def _borrow(cbits, rbits_sh, s) -> jnp.ndarray:
    """SecureNN bit circuit + provider step: 1{c < r} over the given
    bit width, from public bits ``cbits`` (N, nb) and Z_67 bit shares
    ``rbits_sh`` (2, N, nb), masked by common ``s``. Returns the
    provider's plaintext borrow bit (N,) int64 (the caller re-shares).
    """
    #   e_i = c_i XOR r_i = c_i + r_i - 2 c_i r_i
    #   t_i = c_i - r_i + 1 + prefix_i,  prefix_i = sum_{j<i} e_j
    e = cbits[None] * jnp.array([1, 0], jnp.int32)[:, None, None] \
        + rbits_sh - 2 * cbits[None] * rbits_sh
    prefix = jnp.cumsum(e, axis=-1) - e  # exclusive prefix (MSB first)
    t = (cbits[None] + 1) * jnp.array([1, 0], jnp.int32)[:, None, None] \
        - rbits_sh + prefix
    d = (t * s[None]) % _P  # masked shares -> provider

    dv = (d[0] + d[1]) % _P
    return jnp.any(dv == 0, axis=-1).astype(jnp.int64)  # 1{c' < r'}


def gen_sign(key, n: int, n_bits: int = N_BITS) -> SnnKeys:
    """Dealer phase for a batch of n sign extractions over Z_2^n_bits."""
    udt = _udt(n_bits)
    nb = n_bits - 1
    k_r, k_r0, k_rb, k_br, k_s, k_u = jax.random.split(key, 6)
    r = jax.random.bits(k_r, (n,), udt)
    r0 = jax.random.bits(k_r0, (n,), udt)
    r_sh = jnp.stack([r0, r - r0])

    rbits = _decompose(r, nb)  # low n-1 bits, MSB first
    rb0 = jax.random.randint(k_rb, (n, nb), 0, _P, jnp.int32)
    rbits_sh = jnp.stack([rb0, (rbits - rb0) % _P])

    b_r_val = (r >> udt(nb)).astype(jnp.int64)
    b_r = S.share(k_br, b_r_val)

    s = jax.random.randint(k_s, (n, nb), 1, _P, jnp.int32)
    u = S.rand_ring(k_u, (n,))
    return SnnKeys(r_sh, rbits_sh, b_r, s, u)


def msb(key, x: AShare, keys: SnnKeys) -> AShare:
    """Shares of 1{x < 0} for a flat (N,) sharing
    (|x| < 2^(n_bits - 1); n_bits inferred from the keys)."""
    nb = keys.rbits_sh.shape[-1]
    # open c = m + r mod 2^n (each party adds its mask share locally)
    masked = x.data.astype(keys.r_sh.dtype) + keys.r_sh
    c = masked[0] + masked[1]  # public opening, uniform in Z_2^n

    cbits = _decompose(c, nb)
    b_c = (c >> c.dtype.type(nb)).astype(jnp.int64)  # public bit_{n-1}(c)

    beta = _borrow(cbits, keys.rbits_sh, keys.s)  # borrow = 1{c' < r'}
    borrow = AShare(jnp.stack([keys.u, beta - keys.u]))

    # msb = b_c XOR b_r XOR borrow; one Beaver product for b_r XOR borrow
    br_x_bw = beaver.mul(key, keys.b_r, borrow)
    B = S.add(S.add(keys.b_r, borrow), S.mul_public(br_x_bw, -2))
    out = S.add_public(S.mul_public(B, 1 - 2 * b_c), b_c)
    return out


def sign_shares(key, x: AShare, n_bits: int = N_BITS) -> AShare:
    """Dealer + online in one call: shares of 1{x < 0}, any shape.
    Drop-in for ``compare.sign_shares`` (the FSS path)."""
    flat = S.reshape(x, (-1,))
    k_gen, k_mul = jax.random.split(key)
    keys = gen_sign(k_gen, flat.shape[0], n_bits)
    s = msb(k_mul, flat, keys)
    return S.reshape(s, x.shape)


# ------------------------------------------------------------ select_share

def select_share(key, alpha: AShare, x: AShare, y: AShare) -> AShare:
    """``(1 - alpha) x + alpha y`` for a shared bit ``alpha``
    (``securenn.py:137-170``): one Beaver product + re-randomization."""
    k_mul, k_z = jax.random.split(key)
    z = S.add(x, beaver.mul(k_mul, alpha, S.sub(y, x)))
    fresh = S.rand_ring(k_z, z.shape)  # the reference's zero-share u
    return AShare(jnp.stack([z.data[0] + fresh, z.data[1] - fresh]))


# ----------------------------------------------------------- share_convert

class ConvertKeys(NamedTuple):
    r_sh: jnp.ndarray      # (2, N) uint64 — shares of r over Z_2^64
    rbits_sh: jnp.ndarray  # (2, N, 64) int32 — Z_67 shares of ALL r bits
    neg_r_m: jnp.ndarray   # (2, N) uint64 — shares over Z_M of (-r mod M)
    s: jnp.ndarray         # (N, 64) int32 — common masks
    u_m: jnp.ndarray       # (N,) uint64 — provider re-share randomness (Z_M)


def add_mod_m(a, b):
    """Addition in Z_M, M = 2^64 - 1, on uint64 operands < M.
    uint64 wraparound is mod 2^64 = M + 1, so a wrap deficit is exactly
    +1; then one conditional subtract reduces below M."""
    sw = a + b
    sv = sw + (sw < a).astype(jnp.uint64)  # 2^64 = 1 (mod M)
    return jnp.where(sv >= M_RING, sv - M_RING, sv)


def neg_mod_m(a):
    return jnp.where(a == 0, jnp.uint64(0), M_RING - a)


def reconstruct_mod_m(shares) -> jnp.ndarray:
    """Open a (2, ...) Z_M sharing."""
    return add_mod_m(shares[0], shares[1])


def gen_convert(key, n: int) -> ConvertKeys:
    k_r, k_r0, k_rb, k_nr, k_s, k_u = jax.random.split(key, 6)
    r = jax.random.bits(k_r, (n,), jnp.uint64)
    r0 = jax.random.bits(k_r0, (n,), jnp.uint64)
    r_sh = jnp.stack([r0, r - r0])

    rbits = _decompose(r, 64)
    rb0 = jax.random.randint(k_rb, (n, 64), 0, _P, jnp.int32)
    rbits_sh = jnp.stack([rb0, (rbits - rb0) % _P])

    # shares over Z_M of (-r mod M); r mod M maps 2^64-1 -> 0
    r_m = jnp.where(r == M_RING, jnp.uint64(0), r)
    nr0 = jnp.minimum(jax.random.bits(k_nr, (n,), jnp.uint64),
                      M_RING - 1)  # uniform enough re-randomizer
    neg_r_m = jnp.stack([nr0, add_mod_m(neg_mod_m(r_m), neg_mod_m(nr0))])

    s = jax.random.randint(k_s, (n, 64), 1, _P, jnp.int32)
    u_m = jnp.minimum(jax.random.bits(k_u, (n,), jnp.uint64), M_RING - 1)
    return ConvertKeys(r_sh, rbits_sh, neg_r_m, s, u_m)


def share_convert(key, x: AShare) -> jnp.ndarray:
    """Convert a Z_{2^64} sharing to a Z_{2^64 - 1} sharing of the same
    value (``securenn.py:372-480``; the upstream body is commented out
    and falls back to re-randomization — this is the real protocol).

    Requires ``value != 2^64 - 1`` (the reference's same precondition).
    Mechanism: open ``c = a + r`` over Z_2^64; over the integers
    ``a = c - r + 2^64 * w`` with ``w = 1{c < r}``, and ``2^64 = 1
    (mod M)``, so ``a = c - r + w (mod M)``. The borrow ``w`` comes
    from the full 64-bit SecureNN circuit; the dealer supplies Z_M
    shares of ``-r``. Returns (2, ...) uint64 shares in Z_M (use
    :func:`reconstruct_mod_m` / :func:`add_mod_m`).
    """
    flat = S.reshape(x, (-1,))
    n = flat.shape[0]
    keys = gen_convert(key, n)

    masked = flat.data.astype(jnp.uint64) + keys.r_sh
    c = masked[0] + masked[1]  # public, uniform in Z_2^64

    w = _borrow(_decompose(c, 64), keys.rbits_sh, keys.s)  # 1{c < r}
    # provider re-shares w over Z_M
    w_sh = jnp.stack([keys.u_m,
                      add_mod_m(w.astype(jnp.uint64), neg_mod_m(keys.u_m))])

    c_m = jnp.where(c == M_RING, jnp.uint64(0), c)
    y0 = add_mod_m(add_mod_m(c_m, keys.neg_r_m[0]), w_sh[0])
    y1 = add_mod_m(keys.neg_r_m[1], w_sh[1])
    out = jnp.stack([y0, y1])
    return out.reshape((2,) + x.shape)


# --------------------------------------------------------------- division

def division(key, x: AShare, y: AShare, bit_len_max: int = 32) -> AShare:
    """Private integer division: shares of ``floor(x / y)`` for
    non-negative ``x`` and positive ``y`` (``securenn.py:553-608``).

    SecureNN long division: for each bit i from high to low, test
    ``x - u - 2^i y >= 0`` (one 64-bit sign extraction — the
    intermediate magnitudes exceed the default 32-bit comparison
    domain), conditionally subtract, and accumulate ``2^i`` into the
    quotient. ``bit_len_max`` bounds the quotient bits (the reference
    defaults to Q_BITS // 2 = 32 for the same overflow reason).
    Requires ``2^bit_len_max * y < 2^62``.
    """
    if y.shape != x.shape and math.prod(y.shape) != 1:
        raise ValueError(
            f"division: divisor shape {y.shape} must be scalar (size 1) "
            f"or exactly match the dividend shape {x.shape} — general "
            "broadcasting would silently divide by the wrong elements")
    xf = S.reshape(x, (-1,))
    yf = S.reshape(y, (-1,)) if y.shape == x.shape else y
    if yf.shape != xf.shape:
        yf = AShare(jnp.broadcast_to(
            yf.data.reshape(2, -1)[:, :1], xf.data.shape))

    keys = jax.random.split(key, 2 * bit_len_max)
    u = S.zeros_like(xf)
    q = S.zeros_like(xf)
    for j, i in enumerate(range(bit_len_max - 1, -1, -1)):
        two_i_y = S.mul_public(yf, 1 << i)
        z = S.sub(S.sub(xf, u), two_i_y)
        # beta = 1{z >= 0} over the full 64-bit domain
        beta = S.add_public(S.neg(sign_shares(keys[2 * j], z, n_bits=64)), 1)
        v = beaver.mul(keys[2 * j + 1], beta, two_i_y)
        q = S.add(q, S.mul_public(beta, 1 << i))
        u = S.add(u, v)
    return S.reshape(q, x.shape)
