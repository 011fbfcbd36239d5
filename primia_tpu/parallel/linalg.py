"""Privacy-preserving distributed linear algebra / regression.

Reference: ``syft/frameworks/torch/linalg/`` — ``EncryptedLinearRegression``
(Bayesian/OLS regression over per-worker pointer data: remote X^T X /
X^T y dot products, MPC-shared and summed, then solved locally,
``lr.py:19-303``), ``DASH`` (covariate-adjusted association scan using a
remote QR, ``lr.py:305-567``), and distributed ``qr`` / ``inv_sym``
(``operations.py``).

TPU redesign: a "worker" is a node shard. Per-node Gram/cross products
are one batched einsum each; the cross-worker sum rides the same
fixed-point encode -> additive-share -> share-sum -> reveal path as
secure FedAvg (``mpc/aggregation.py`` semantics), so raw rows never
leave their node and only MPC-aggregated second moments are revealed —
the reference's exact privacy contract. The solve itself is tiny
(p x p) and runs plaintext on the aggregate, as in the reference.

The distributed QR is a CholeskyQR: R from the (securely aggregated)
Gram matrix, Q = X R^{-1} computed locally per node — the tall-skinny
QR shape that maps to the MXU, replacing the reference's sequential
Householder-over-pointers loop.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from primia_tpu.mpc import fixed
from primia_tpu.mpc import shares as S

# second moments of standardized regressors easily exceed the default
# 16-bit activation scaling; 24 fractional bits keeps ~1e-7 resolution
# with plenty of ring headroom for p x p sums
_LINALG_FRAC_BITS = 24


def _secure_sum(key, per_node: Sequence[jnp.ndarray], frac_bits: int = _LINALG_FRAC_BITS):
    """sum_i m_i without revealing any m_i: encode each node's matrix in
    fixed point, split into 2-party additive shares, sum in share space,
    reveal only the total (the aggregation path of ``mpc/aggregation``)."""
    keys = jax.random.split(key, len(per_node))
    acc = None
    for k, m in zip(keys, per_node):
        sh = S.share(k, fixed.encode(m, frac_bits))
        acc = sh if acc is None else S.add(acc, sh)
    return fixed.decode(S.reconstruct(acc), frac_bits)


def inv_sym(m: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-positive-definite inverse via Cholesky (reference
    ``operations.py:inv_sym`` uses an LDL factorization)."""
    L = jnp.linalg.cholesky(m)
    eye = jnp.eye(m.shape[0], dtype=m.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv.T @ Linv


def cholesky_qr(key, X_nodes: Sequence[jnp.ndarray]):
    """Distributed reduced QR of the row-stacked node matrices.

    R = chol(sum_i X_i^T X_i)^T via secure aggregation; each node keeps
    its Q_i = X_i R^{-1} locally (Q never crosses nodes). Returns
    (Q_nodes, R). Reference: ``operations.py:qr`` over pointers.
    """
    gram = _secure_sum(key, [x.T @ x for x in X_nodes])
    R = jnp.linalg.cholesky(gram).T
    Rinv = jax.scipy.linalg.solve_triangular(R, jnp.eye(R.shape[0], dtype=R.dtype),
                                             lower=False)
    return [x @ Rinv for x in X_nodes], R


def _normal_sf(z):
    return 0.5 * jax.scipy.special.erfc(z / math.sqrt(2.0))


class RegressionSummary(NamedTuple):
    coef: np.ndarray
    std_errors: np.ndarray
    p_values: np.ndarray
    sigma2: float
    n_obs: int


class EncryptedLinearRegression:
    """OLS over node-sharded (X, y) with MPC-aggregated moments.

    Mirrors the reference's API (``lr.py:19-303``): ``fit`` over lists of
    per-worker arrays, then ``coef_`` / ``intercept_`` / ``predict`` /
    ``summarize``. ``crypto`` mirrors the reference flag gating MPC vs
    plain aggregation of the moment matrices.
    """

    def __init__(self, fit_intercept: bool = True, crypto: bool = True, seed: int = 0):
        self.fit_intercept = fit_intercept
        self.crypto = crypto
        self._key = jax.random.PRNGKey(seed)
        self.summary: Optional[RegressionSummary] = None

    def fit(self, X_nodes: List, y_nodes: List):
        if len(X_nodes) != len(y_nodes) or not X_nodes:
            raise ValueError("need matching non-empty per-node X and y lists")
        X_nodes = [jnp.asarray(x, jnp.float64) for x in X_nodes]
        y_nodes = [jnp.asarray(y, jnp.float64).reshape(-1) for y in y_nodes]
        p = X_nodes[0].shape[1]
        if any(x.shape[1] != p for x in X_nodes):
            raise ValueError("inconsistent feature counts across nodes")
        if any(x.shape[0] != y.shape[0] for x, y in zip(X_nodes, y_nodes)):
            raise ValueError("X/y row mismatch on a node")
        if self.fit_intercept:
            X_nodes = [jnp.concatenate([jnp.ones((x.shape[0], 1), x.dtype), x], 1)
                       for x in X_nodes]

        # per-node sufficient statistics, packed so ONE secure sum
        # reveals exactly [X^T X | X^T y | y^T y] and nothing else
        stats = [
            jnp.concatenate([
                jnp.concatenate([x.T @ x, (x.T @ y)[:, None]], 1),
                jnp.concatenate([(x.T @ y)[None, :], jnp.array([[y @ y]])], 1),
            ], 0)
            for x, y in zip(X_nodes, y_nodes)
        ]
        if self.crypto:
            self._key, k = jax.random.split(self._key)
            total = _secure_sum(k, stats)
        else:
            total = sum(stats)
        d = p + (1 if self.fit_intercept else 0)
        xtx, xty, yty = total[:d, :d], total[:d, d], float(total[d, d])
        n = sum(int(x.shape[0]) for x in X_nodes)

        xtx_inv = inv_sym(xtx)
        beta = xtx_inv @ xty
        rss = yty - 2.0 * beta @ xty + beta @ xtx @ beta
        dof = max(n - d, 1)
        sigma2 = float(rss) / dof
        se = jnp.sqrt(sigma2 * jnp.diag(xtx_inv))
        pvals = 2.0 * _normal_sf(jnp.abs(beta / se))

        self.summary = RegressionSummary(
            np.asarray(beta), np.asarray(se), np.asarray(pvals), sigma2, n)
        return self

    @property
    def coef_(self):
        b = self.summary.coef
        return b[1:] if self.fit_intercept else b

    @property
    def intercept_(self):
        return float(self.summary.coef[0]) if self.fit_intercept else 0.0

    def predict(self, X):
        X = jnp.asarray(X, jnp.float64)
        return np.asarray(X @ jnp.asarray(self.coef_) + self.intercept_)

    def summarize(self) -> str:
        """Console coefficient table (reference ``summarize``)."""
        s = self.summary
        names = (["intercept"] if self.fit_intercept else []) + [
            f"x{i}" for i in range(len(s.coef) - (1 if self.fit_intercept else 0))]
        lines = [f"EncryptedLinearRegression  n={s.n_obs}  sigma^2={s.sigma2:.6g}",
                 f"{'term':>10} {'coef':>12} {'std err':>12} {'p-value':>10}"]
        for nm, c, e, pv in zip(names, s.coef, s.std_errors, s.p_values):
            lines.append(f"{nm:>10} {c:>12.6f} {e:>12.6f} {pv:>10.4g}")
        return "\n".join(lines)


class DASH:
    """Covariate-adjusted association scan (reference ``lr.py:305-567``).

    For each candidate regressor column x_j (e.g. a SNP) test its effect
    on y after projecting out shared covariates C: residualize through
    the distributed CholeskyQR of C, then per-column OLS on the
    residuals — all cross-node reductions via the same secure sum.
    """

    def __init__(self, fit_intercept: bool = True, crypto: bool = True, seed: int = 0):
        self.fit_intercept = fit_intercept
        self.crypto = crypto
        self._key = jax.random.PRNGKey(seed)

    def fit(self, X_nodes: List, C_nodes: List, y_nodes: List):
        X_nodes = [jnp.asarray(x, jnp.float64) for x in X_nodes]
        C_nodes = [jnp.asarray(c, jnp.float64) for c in C_nodes]
        y_nodes = [jnp.asarray(y, jnp.float64).reshape(-1) for y in y_nodes]
        if self.fit_intercept:
            C_nodes = [jnp.concatenate([jnp.ones((c.shape[0], 1), c.dtype), c], 1)
                       for c in C_nodes]

        self._key, kq, ks = jax.random.split(self._key, 3)
        Q_nodes, _ = cholesky_qr(kq, C_nodes)

        # residualize locally: r = v - Q (Q^T v), with Q^T v securely
        # summed across nodes (Q columns are orthonormal globally)
        def residualize(V_nodes, key):
            qtv = [q.T @ v for q, v in zip(Q_nodes, V_nodes)]
            total = _secure_sum(key, qtv) if self.crypto else sum(qtv)
            return [v - q @ total for q, v in zip(Q_nodes, V_nodes)]

        k1, k2, k3 = jax.random.split(ks, 3)
        Xr = residualize(X_nodes, k1)
        yr = residualize(y_nodes, k2)

        # per-column scan moments: diag(X^T X), X^T y, y^T y — one pack
        packed = [
            jnp.concatenate([jnp.sum(x * x, 0), x.T @ y,
                             jnp.array([y @ y])])
            for x, y in zip(Xr, yr)
        ]
        total = _secure_sum(k3, packed) if self.crypto else sum(packed)
        m = X_nodes[0].shape[1]
        sxx, sxy, syy = total[:m], total[m:2 * m], float(total[2 * m])

        n = sum(int(x.shape[0]) for x in X_nodes)
        dof = max(n - C_nodes[0].shape[1] - 1, 1)
        beta = sxy / sxx
        rss = jnp.maximum(syy - beta * sxy, 0.0)
        se = jnp.sqrt(rss / dof / sxx)
        self.coef_ = np.asarray(beta)
        self.std_errors_ = np.asarray(se)
        self.p_values_ = np.asarray(2.0 * _normal_sf(jnp.abs(beta / se)))
        return self

    def get_coeff(self):
        return self.coef_

    def get_standard_errors(self):
        return self.std_errors_

    def get_p_values(self):
        return self.p_values_
