"""Share-space math library — the FixedPrecisionTensor function library.

The reference FPT ships iterative/polynomial approximations for
``exp`` / ``sigmoid`` / ``tanh`` / ``log`` / ``reciprocal`` / matrix
``inverse`` / integer ``pow`` (``syft/frameworks/torch/tensors/
interpreters/precision.py:380-740``) and share-space
``argmax`` / ``argmin`` / ``max`` / ``min`` / ``var`` over the additive
sharing (``additive_shared.py:990-1100``, CrypTen-style fixed-round
pairwise comparisons). These are the gate to any non-ReLU encrypted
model (sigmoid/tanh for RNNs, inverse-sqrt for a *private* batch norm).

TPU-first redesign, same approximation formulas:

- every comparison batch is ONE vectorized sign-extraction call over
  the whole operand (the protocol backend — SecureNN circuit or fused
  Pallas DCF — is picked by the ``MpcContext``), instead of the
  reference's per-element message dispatch;
- public-coefficient arithmetic stays in the ring: encode once,
  multiply locally, one shift-truncation — public divisions by powers
  of two are pure share-local arithmetic shifts;
- polynomial sums (Maclaurin/Chebyshev) accumulate the un-truncated
  scale-``2^{2f}`` products and truncate ONCE, which is both cheaper
  and strictly more accurate than the reference's per-term truncation.

All functions take the engine's ``MpcContext`` (dealer PRNG + fixed
point config) and ``AShare`` operands; values are fixed-point encoded
at ``2**ctx.frac_bits``. Domains are inherited from the reference's
formulas (e.g. ``reciprocal`` needs ``|x|`` within the exp limit
approximation's radius); each docstring states them.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from primia_tpu.mpc import beaver, fixed
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.shares import AShare


# --------------------------------------------------------------- helpers

def _domain_check(ctx, x: AShare, lo: float, hi: float, fn_name: str,
                  *, absolute: bool = False) -> None:
    """Debug-mode domain guard (``ctx.debug_domains``): reconstruct the
    operand and fail loudly when any element leaves the approximation's
    design range ``[lo, hi]`` (``absolute`` checks ``|x|``). The
    reference silently returns garbage outside these ranges
    (``precision.py:476-520``); here the same silent posture is the
    default, but debug mode turns it into an error. Reconstruction is a
    deliberate privacy breach — debug only. Uses ``jax.debug.callback``,
    so under jit the error surfaces as a ``JaxRuntimeError`` at block
    time (host callbacks are unsupported on the axon TPU tunnel; run
    debug mode on the CPU mesh)."""
    if not getattr(ctx, "debug_domains", False):
        return
    v = fixed.decode(S.reconstruct(x), ctx.frac_bits)
    if absolute:
        v = jnp.abs(v)
    bad = jnp.logical_or(v < lo, v > hi)

    def _raise(nbad, vmin, vmax):
        if int(nbad):
            rng = "|x|" if absolute else "x"
            raise FloatingPointError(
                f"mpc.functions.{fn_name}: {int(nbad)} element(s) have "
                f"{rng} outside the approximation domain [{lo:g}, {hi:g}] "
                f"(observed [{float(vmin):g}, {float(vmax):g}]); the "
                "result would be silently wrong")

    jax.debug.callback(_raise, jnp.sum(bad), jnp.min(v), jnp.max(v))

def _enc(ctx, c):
    return fixed.encode(c, ctx.frac_bits)


def add_public(ctx, x: AShare, c) -> AShare:
    """x + public float c."""
    return S.add_public(x, _enc(ctx, c))


def mul_public(ctx, x: AShare, c) -> AShare:
    """x * public float c (one local product + one truncation)."""
    return AShare(fixed.truncate_shares(
        S.mul_public(x, _enc(ctx, c)).data, ctx.frac_bits))


def _mul(ctx, x: AShare, y: AShare, *, truncate: bool = True) -> AShare:
    z = beaver.mul(ctx.next_key(), x, y)
    if truncate:
        z = AShare(fixed.truncate_shares(z.data, ctx.frac_bits))
    return z


def _matmul(ctx, x: AShare, y: AShare) -> AShare:
    z = beaver.matmul(ctx.next_key(), x, y)
    return AShare(fixed.truncate_shares(z.data, ctx.frac_bits))


def _div_pow2(x: AShare, bits: int) -> AShare:
    """x / 2**bits — share-local arithmetic shift (SecureML truncation:
    error <= 1 ulp), replacing the reference's fixed-point division by
    a public power of two."""
    return AShare(fixed.truncate_shares(x.data, bits))


def sign_int(ctx, x: AShare) -> AShare:
    """Integer (NOT fixed-point-encoded) shares of sign(x) in {-1, +1};
    maps x == 0 to +1 (the reference's ``signum`` maps 0 to 0 — a
    measure-zero divergence that ``reciprocal``/``_sigmoid_exp``, its
    only internal users, never see)."""
    b = ctx.sign_shares(x)  # shares of 1{x < 0}
    return S.add_public(S.mul_public(b, -2), 1)


def sign(ctx, x: AShare) -> AShare:
    """Fixed-point-encoded sign(x) (reference ``precision.py:560``)."""
    return S.mul_public(sign_int(ctx, x), 1 << ctx.frac_bits)


def ge_zero_int(ctx, x: AShare) -> AShare:
    """Integer shares of 1{x >= 0}."""
    return S.add_public(S.neg(ctx.sign_shares(x)), 1)


# ------------------------------------------------------ pow / exp / log

def pow(ctx, x: AShare, power: int) -> AShare:  # noqa: A001
    """Integer power by square-and-multiply (``precision.py:389-415``)."""
    if power < 0:
        raise ValueError("Negative integer powers are not allowed.")
    if power == 0:
        return S.make_public(jnp.full(x.shape, 1 << ctx.frac_bits, jnp.int64))
    base, result = x, None
    while power > 0:
        if power % 2 == 1:
            result = base if result is None else _mul(ctx, result, base)
        power //= 2
        if power:
            base = _mul(ctx, base, base)
    return result


def exp(ctx, x: AShare, iterations: int = 8) -> AShare:
    """Limit approximation ``exp(x) = (1 + x/2^d)^(2^d)`` with
    ``d = iterations`` (``precision.py:566-579``). Accurate for
    ``x in [-2^d, ~8]`` (beyond, the base leaves the convergent region).
    """
    _domain_check(ctx, x, -(2.0 ** iterations), 8.0, "exp")
    return _exp_unchecked(ctx, x, iterations)


def _exp_unchecked(ctx, x: AShare, iterations: int = 8) -> AShare:
    """``exp`` body without the domain guard — for internal callers
    (``log``/``reciprocal``/``sigmoid``) whose intermediates leave the
    user-facing domain only to underflow harmlessly toward zero."""
    y = add_public(ctx, _div_pow2(x, iterations), 1.0)
    for _ in range(iterations):
        y = _mul(ctx, y, y)
    return y


def log(ctx, x: AShare, iterations: int = 2, exp_iterations: int = 8) -> AShare:
    """Natural log by 6th-order modified Householder iterations on
    ``f(y) = 1 - x * exp(-y)`` (``precision.py:648-677``):

        y_0 = x/31 + 1.59 - 20 * exp(-2x - 1.4)
        h = 1 - x * exp(-y_n)
        y_{n+1} = y_n - h * (1 + h/2 + h^2/3 + h^3/4 + h^4/5 + h^5/6)

    Domain: x in ~[1e-3, 2e2] (the initialization's design range).
    """
    _domain_check(ctx, x, 1e-3, 2e2, "log")
    e0 = _exp_unchecked(ctx, add_public(ctx, S.mul_public(x, -2), -1.4),
                        iterations=exp_iterations)
    y = S.add(mul_public(ctx, x, 1.0 / 31.0),
              add_public(ctx, mul_public(ctx, e0, -20.0), 1.59))
    one = _enc(ctx, 1.0)
    for _ in range(iterations):
        ey = _exp_unchecked(ctx, S.neg(y), iterations=exp_iterations)
        h1 = S.add_public(S.neg(_mul(ctx, x, ey)), one)  # h
        h2 = _mul(ctx, h1, h1)
        h3 = _mul(ctx, h2, h1)
        h4 = _mul(ctx, h2, h2)
        h5 = _mul(ctx, h4, h1)
        # 1 + h/2 + h^2/3 + h^3/4 + h^4/5 + h^5/6
        series = S.add_public(
            S.add(S.add(mul_public(ctx, h1, 1 / 2), mul_public(ctx, h2, 1 / 3)),
                  S.add(S.add(mul_public(ctx, h3, 1 / 4),
                              mul_public(ctx, h4, 1 / 5)),
                        mul_public(ctx, h5, 1 / 6))),
            one)
        y = S.sub(y, _mul(ctx, h1, series))
    return y


# ------------------------------------------------- reciprocal / rsqrt

def reciprocal(ctx, x: AShare, method: str = "nr", nr_iters: int = 10) -> AShare:
    """1/x (``precision.py:476-520``, CrypTen formulas).

    - ``nr``: Newton-Raphson ``r <- 2r - r^2 |x|`` from
      ``r_0 = 3 exp(0.5 - |x|) + 0.003``, sign fixed up at the end.
      Domain |x| in ~[2^-7, 120] (the exp limit radius bounds above).
    - ``newton``: the reference's 80-iteration damped iteration with
      C=20 (``precision.py:505-515``). **Despite its name it converges
      to ``a^(-1/2)``, not ``1/a``** (fixed point of
      ``x <- x (C+1 - a x^2)/C`` is ``a x^2 = 1``) — which is exactly
      why the reference's private batch_norm (``nn/functional.py:66``)
      comes out mathematically correct: it multiplies ``x - mean`` by
      rsqrt(var). Kept verbatim for parity; positive inputs in (0, ~40).
    - ``log``: ``exp(-log(|x|))`` with the sign fixed up.
    """
    method = method.lower()
    if method == "nr":
        _domain_check(ctx, x, 2.0 ** -7, 120.0, "reciprocal", absolute=True)
        s = sign_int(ctx, x)
        ax = beaver.mul(ctx.next_key(), x, s)  # integer factor: no truncation
        r = add_public(
            ctx,
            S.mul_public(_exp_unchecked(ctx, add_public(ctx, S.neg(ax), 0.5)), 3),
            0.003)
        for _ in range(nr_iters):
            # (r x) first — it converges to 1, so the truncation after
            # each product stays well-conditioned even when r << 1 and
            # x >> 1 (r*r first loses ~all fractional bits at x ~ 100)
            rx = _mul(ctx, r, ax)
            r = S.sub(S.mul_public(r, 2), _mul(ctx, r, rx))
        return beaver.mul(ctx.next_key(), r, s)
    if method == "newton":
        _domain_check(ctx, x, 1e-4, 40.0, "reciprocal[newton]")
        C = 20
        y = S.add_public(S.neg(x), _enc(ctx, C + 1))
        r = mul_public(ctx, y, 1.0 / C)
        for _ in range(79):
            y = S.add_public(S.neg(_mul(ctx, x, _mul(ctx, r, r))),
                             _enc(ctx, C + 1))
            r = mul_public(ctx, _mul(ctx, y, r), 1.0 / C)
        return r
    if method == "log":
        s = sign_int(ctx, x)
        ax = beaver.mul(ctx.next_key(), x, s)
        return beaver.mul(ctx.next_key(), _exp_unchecked(ctx, S.neg(log(ctx, ax))), s)
    raise ValueError(f"Invalid method {method} given for reciprocal function")


def div(ctx, x: AShare, y: AShare, method: str = "reciprocal", **kw) -> AShare:
    """Private-divisor fixed-point division ``x / y``.

    - ``reciprocal`` (default): ``x * reciprocal(y)`` — the FPT route.
    - ``securenn``: exact SecureNN long division
      (``securenn.py:553-608``) on ``(|x| << frac_bits) / |y|`` with the
      sign fixed up by one extra product — bit-exact
      ``floor`` semantics instead of Newton error, ~32 comparison
      rounds. Domain |x| < 2^14 at frac_bits=16 (numerator headroom).
    """
    if method == "reciprocal":
        return _mul(ctx, x, reciprocal(ctx, y, **kw))
    if method == "securenn":
        from primia_tpu.mpc import securenn

        _domain_check(ctx, x, 0.0, 2.0 ** 14, "div[securenn]",
                      absolute=True)
        sx = sign_int(ctx, x)
        sy = sign_int(ctx, y)
        ax = beaver.mul(ctx.next_key(), x, sx)
        ay = beaver.mul(ctx.next_key(), y, sy)
        num = S.mul_public(ax, 1 << ctx.frac_bits)
        q = securenn.division(ctx.next_key(), num, ay, **kw)
        s = beaver.mul(ctx.next_key(), sx, sy)  # sign(x) sign(y)
        return beaver.mul(ctx.next_key(), q, s)
    raise ValueError(f"unknown div method {method!r}")


def maxpool(ctx, x: AShare):
    """(max, argmax-index) over the flattened tensor — the reference's
    ``securenn.maxpool`` contract (``securenn.py:611-663``), computed
    in fixed rounds via the pairwise one-hot instead of the
    reference's O(n)-round sequential select_share scan."""
    return max(ctx, x), argmax(ctx, x)


def maxpool_deriv(ctx, x: AShare) -> AShare:
    """One-hot of the (flattened) max position, shaped like ``x`` —
    the reference's ``securenn.maxpool_deriv`` (``securenn.py:666-710``,
    which opens a masked index and rolls a public one-hot; here the
    pairwise one-hot is already oblivious). Integer bit shares."""
    return argmax(ctx, x, one_hot=True)


def inverse_sqrt(ctx, x: AShare, iterations: int = 7) -> AShare:
    """rsqrt(x) by Newton ``y <- y (3 - x y^2) / 2`` from the CrypTen
    initialization ``y_0 = 2.2 exp(-(x/2 + 0.2)) + 0.2 - x/1024``.
    Domain x in ~[1e-2, 200]. Quadratic convergence — the same value
    the reference's misnamed ``reciprocal(method="newton")`` reaches
    after 80 damped steps (see :func:`reciprocal`), at ~1/10 the
    products; the engine's private ``batch_norm`` uses this."""
    e = _exp_unchecked(ctx, S.neg(add_public(ctx, _div_pow2(x, 1), 0.2)))
    y = add_public(
        ctx,
        S.sub(S.add(S.mul_public(e, 2), mul_public(ctx, e, 0.2)),
              _div_pow2(x, 10)),
        0.2)  # y_0 = 2.2 exp(-(x/2 + 0.2)) + 0.2 - x/1024
    for _ in range(iterations):
        y2 = _mul(ctx, y, y)
        xy2 = _mul(ctx, x, y2)
        y = _div_pow2(_mul(ctx, y, S.add_public(S.neg(xy2), _enc(ctx, 3.0))), 1)
    return y


def sqrt(ctx, x: AShare, iterations: int = 7) -> AShare:
    """sqrt(x) = x * rsqrt(x)."""
    return _mul(ctx, x, inverse_sqrt(ctx, x, iterations))


def inverse(ctx, x: AShare, iterations: int = 8) -> AShare:
    """Newton-Schulz matrix inverse for batches of square matrices
    (``precision.py:524-540``): ``inv <- 2 inv - inv @ x @ inv`` from
    ``inv_0 = 0.1 I``."""
    if x.ndim < 2 or x.shape[-1] != x.shape[-2]:
        raise ValueError("inverse needs batches of square matrices")
    eye = np.broadcast_to(0.1 * np.eye(x.shape[-1]), x.shape)
    inv = S.make_public(fixed.encode(eye, ctx.frac_bits))
    for _ in range(iterations):
        inv = S.sub(S.mul_public(inv, 2),
                    _matmul(ctx, _matmul(ctx, inv, x), inv))
    return inv


# ------------------------------------------------------ sigmoid / tanh

def _chebyshev_series(fn, width: float, terms: int) -> np.ndarray:
    """Chebyshev series coefficients of ``fn`` on [-width, width]
    (public, computed at trace time — CrypTen ``chebyshev_series``)."""
    n = np.arange(terms, dtype=np.float64)
    xs = width * np.cos((n + 0.5) * np.pi / terms)
    cos_t = np.cos(np.outer(n, n + 0.5) * np.pi / terms)
    return (2.0 / terms) * (cos_t @ fn(xs))


def _tanh_chebyshev(ctx, x: AShare, maxval: int = 6, terms: int = 32) -> AShare:
    """tanh via a truncated odd-Chebyshev expansion on
    [-maxval, maxval], clamped to +/-1 outside (``precision.py:680-717``
    <- CrypTen). One batched comparison handles both clamp gates."""
    coeffs = _chebyshev_series(np.tanh, maxval, terms)[1::2]
    y = mul_public(ctx, x, 1.0 / maxval)

    # odd Chebyshev polynomials by T_{n+2} = 2 T_2 T_n - T_{n-2}
    t2 = add_public(ctx, S.mul_public(_mul(ctx, y, y), 2), -1.0)
    polys = [y]
    if len(coeffs) > 1:
        polys.append(S.sub(S.mul_public(_mul(ctx, t2, y), 2), y))
    while len(polys) < len(coeffs):
        polys.append(S.sub(S.mul_public(_mul(ctx, t2, polys[-1]), 2),
                           polys[-2]))

    # sum c_k T_k: accumulate the scale-2^{2f} products, truncate once
    stacked = S.stack(polys, axis=0)
    cvec = _enc(ctx, coeffs).reshape((-1,) + (1,) * x.ndim)
    summed = AShare(jnp.sum(stacked.data * cvec, axis=1))
    out = AShare(fixed.truncate_shares(summed.data, ctx.frac_bits))

    # clamp: gate_up = 1{x > maxval} = msb(maxval - x);
    #        gate_dn = 1{x < -maxval} = msb(x + maxval). One sign batch.
    v = _enc(ctx, float(maxval))
    both = AShare(jnp.stack(
        [S.add_public(S.neg(x), v).data, S.add_public(x, v).data], axis=1))
    gates = ctx.sign_shares(both)
    g_up = AShare(gates.data[:, 0])
    g_dn = AShare(gates.data[:, 1])
    inside = S.add_public(S.neg(S.add(g_up, g_dn)), 1)  # 1 - gu - gd
    clamped = S.mul_public(S.sub(g_up, g_dn), 1 << ctx.frac_bits)
    return S.add(beaver.mul(ctx.next_key(), out, inside), clamped)


def tanh(ctx, x: AShare, method: str = "chebyshev", **kw) -> AShare:
    """(``precision.py:735-738``; default method matches the reference)."""
    if method == "chebyshev":
        return _tanh_chebyshev(ctx, x, **kw)
    if method == "sigmoid":
        return add_public(
            ctx, S.mul_public(sigmoid(ctx, S.mul_public(x, 2), "exp"), 2), -1.0)
    raise ValueError(f"unknown tanh method {method!r}")


def _sigmoid_exp(ctx, x: AShare) -> AShare:
    """Numerically-stable exp formulation (``precision.py:582-607``):
    ``sigmoid(x) = (sigmoid(|x|) - 0.5) sign(x) + 0.5`` with
    ``sigmoid(|x|) = 1 / (1 + exp(-|x|))``. The inner reciprocal uses
    Newton-Raphson (domain [1, 2]: converges in a few steps) where the
    reference recurses into AST division."""
    s = sign_int(ctx, x)
    ax = beaver.mul(ctx.next_key(), x, s)
    denom = add_public(ctx, _exp_unchecked(ctx, S.neg(ax)), 1.0)
    r = reciprocal(ctx, denom, "nr", nr_iters=6)
    return add_public(
        ctx, beaver.mul(ctx.next_key(), add_public(ctx, r, -0.5), s), 0.5)


def _sigmoid_maclaurin(ctx, x: AShare) -> AShare:
    """Degree-5 interpolation on [-8, 8] (``precision.py:609-616``):
    w = [0.5, 1.912e-1, -4.587e-3, 4.207e-5], degrees [0, 1, 3, 5]."""
    w1, w3, w5 = 1.91204779e-01, -4.58667307e-03, 4.20690803e-05
    x2 = _mul(ctx, x, x)
    x3 = _mul(ctx, x2, x)
    x5 = _mul(ctx, x3, x2)
    # the tiny degree-5 coefficient quantizes to 9% error at scale
    # 2^16 (the reference's base-10 10^16 scale holds it exactly);
    # encode the public coefficients with 16 extra bits and shift the
    # whole accumulated sum down once — exact same contract, no extra
    # round
    xb = 16
    cw = lambda w: fixed.encode(w, ctx.frac_bits + xb)
    acc = (S.mul_public(x, cw(w1)).data
           + S.mul_public(x3, cw(w3)).data
           + S.mul_public(x5, cw(w5)).data)
    return add_public(
        ctx, AShare(fixed.truncate_shares(acc, ctx.frac_bits + xb)), 0.5)


def sigmoid(ctx, x: AShare, method: str = "chebyshev") -> AShare:
    """(``precision.py:633-646``; default method matches the reference:
    ``sigmoid(x) = (tanh(x/2) + 1) / 2`` via Chebyshev tanh)."""
    if method == "chebyshev":
        th = _tanh_chebyshev(ctx, _div_pow2(x, 1))
        return add_public(ctx, _div_pow2(th, 1), 0.5)
    if method == "exp":
        return _sigmoid_exp(ctx, x)
    if method == "maclaurin":
        return _sigmoid_maclaurin(ctx, x)
    raise ValueError(f"unknown sigmoid method {method!r}")


# ------------------------------------------- argmax / max / mean / var

def _pairwise_ge(ctx, x: AShare, axis: int) -> AShare:
    """CrypTen/reference fixed-round argmax core
    (``additive_shared.py:1012-1050``, ``helper_argmax_pairwise:1346``):
    integer shares of the one-hot(ish) 1{x_i >= all others} along
    ``axis``. Ties produce multiple ones, as in the reference."""
    n = x.shape[axis]
    daxis = axis + 1  # value axis in the (2, ...) share stack
    if n == 1:
        return S.make_public(jnp.ones(x.shape, jnp.int64))
    diffs = AShare(jnp.stack(
        [x.data - jnp.roll(x.data, i + 1, axis=daxis) for i in range(n - 1)],
        axis=1))
    ge = ge_zero_int(ctx, diffs)  # (n-1, ...) integer bit shares
    wins = AShare(jnp.sum(ge.data, axis=1))
    return ge_zero_int(ctx, S.add_public(wins, -(n - 1)))


def argmax(ctx, x: AShare, axis: Optional[int] = None,
           one_hot: bool = False, keepdims: bool = False) -> AShare:
    """Share-space argmax (``additive_shared.py:1012``). With
    ``one_hot=False`` returns fixed-point-encoded indices (the
    reference multiplies by the scale so ``float_prec`` reveals the
    index); ties sum their indices, exactly like the reference's
    ``_one_hot_to_index``."""
    if axis is None:
        flat = S.reshape(x, (-1,))
        oh = _pairwise_ge(ctx, flat, 0)
        if one_hot:
            return S.reshape(oh, x.shape)
        idx = jnp.arange(flat.shape[0], dtype=jnp.int64)
        return S.mul_public(
            AShare(jnp.sum(oh.data * idx, axis=1)), 1 << ctx.frac_bits)
    oh = _pairwise_ge(ctx, x, axis)
    if one_hot:
        return oh
    n = x.shape[axis]
    shp = [1] * x.ndim
    shp[axis] = n
    idx = jnp.arange(n, dtype=jnp.int64).reshape(shp)
    summed = AShare(jnp.sum(oh.data * idx, axis=axis + 1,
                            keepdims=keepdims))
    return S.mul_public(summed, 1 << ctx.frac_bits)


def argmin(ctx, x: AShare, **kw) -> AShare:
    """(``additive_shared.py:1052``)."""
    return argmax(ctx, S.neg(x), **kw)


def max(ctx, x: AShare, axis: Optional[int] = None,  # noqa: A001
        keepdims: bool = False) -> AShare:
    """max via the one-hot (``additive_shared.py:1063``); the product
    with an integer one-hot needs no truncation."""
    if axis is None:
        flat = S.reshape(x, (-1,))
        oh = _pairwise_ge(ctx, flat, 0)
        prod = beaver.mul(ctx.next_key(), flat, oh)
        return AShare(jnp.sum(prod.data, axis=1))
    oh = _pairwise_ge(ctx, x, axis)
    prod = beaver.mul(ctx.next_key(), x, oh)
    return AShare(jnp.sum(prod.data, axis=axis + 1, keepdims=keepdims))


def min(ctx, x: AShare, **kw) -> AShare:  # noqa: A001
    """(``additive_shared.py:1084``)."""
    return S.neg(max(ctx, S.neg(x), **kw))


def mean(ctx, x: AShare, axis: Optional[int] = None,
         keepdims: bool = False) -> AShare:
    """Public-count mean: local sum + one public-reciprocal product."""
    if axis is None:
        n = math.prod(x.shape)
        summed = AShare(jnp.sum(
            x.data, axis=tuple(range(1, x.data.ndim))))
        if keepdims:  # match jnp.mean: scalar -> rank-preserving (1,)*ndim
            summed = AShare(summed.data.reshape((2,) + (1,) * x.ndim))
    else:
        n = x.shape[axis]
        summed = AShare(jnp.sum(x.data, axis=axis + 1, keepdims=keepdims))
    return mul_public(ctx, summed, 1.0 / n)


def var(ctx, x: AShare, axis: Optional[int] = None,
        unbiased: bool = False, keepdims: bool = False) -> AShare:
    """Share-space variance (``precision.py:742-760``): mean of squared
    deviations, with the reference's unbiased rescale n/(n-1)."""
    mu = mean(ctx, x, axis, keepdims=True)
    if axis is None:
        mud = mu.data.reshape((2,) + (1,) * x.ndim)
        d = AShare(x.data - mud)
        n = math.prod(x.shape)
    else:
        d = S.sub(x, AShare(jnp.broadcast_to(mu.data, x.data.shape)))
        n = x.shape[axis]
    sq = _mul(ctx, d, d)
    out = mean(ctx, sq, axis, keepdims=keepdims)
    if unbiased:
        out = mul_public(ctx, out, n / (n - 1))
    return out
