"""Distributed linalg (EncryptedLinearRegression, DASH, CholeskyQR) and
PATE analysis.

Reference components: ``syft/frameworks/torch/linalg/`` and
``syft/frameworks/torch/dp/pate.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primia_tpu.parallel import linalg
from primia_tpu.train import pate


def _split(rng, X, y, n_nodes=3):
    idx = np.array_split(rng.permutation(len(y)), n_nodes)
    return [X[i] for i in idx], [y[i] for i in idx]


class TestLinearRegression:
    @pytest.fixture(scope="class")
    def problem(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(300, 4))
        beta = np.array([1.5, -2.0, 0.0, 0.7])
        y = 0.8 + X @ beta + rng.normal(scale=0.1, size=300)
        return rng, X, y, beta

    def test_matches_closed_form_ols(self, problem):
        rng, X, y, beta = problem
        Xn, yn = _split(rng, X, y)
        m = linalg.EncryptedLinearRegression().fit(Xn, yn)
        Xi = np.concatenate([np.ones((len(y), 1)), X], 1)
        ref = np.linalg.lstsq(Xi, y, rcond=None)[0]
        np.testing.assert_allclose(m.intercept_, ref[0], atol=1e-3)
        np.testing.assert_allclose(m.coef_, ref[1:], atol=1e-3)

    def test_crypto_and_plain_agree(self, problem):
        rng, X, y, _ = problem
        Xn, yn = _split(rng, X, y)
        enc = linalg.EncryptedLinearRegression(crypto=True).fit(Xn, yn)
        pln = linalg.EncryptedLinearRegression(crypto=False).fit(Xn, yn)
        np.testing.assert_allclose(enc.summary.coef, pln.summary.coef, atol=1e-4)
        np.testing.assert_allclose(enc.summary.std_errors, pln.summary.std_errors,
                                   rtol=1e-3)

    def test_inference_stats(self, problem):
        rng, X, y, _ = problem
        Xn, yn = _split(rng, X, y)
        m = linalg.EncryptedLinearRegression().fit(Xn, yn)
        # x2 has true coefficient 0 -> insignificant; others significant
        assert m.summary.p_values[3] > 0.01
        for j in (0, 1, 2, 4):
            assert m.summary.p_values[j] < 1e-4
        assert "coef" in m.summarize()

    def test_predict(self, problem):
        rng, X, y, _ = problem
        Xn, yn = _split(rng, X, y)
        m = linalg.EncryptedLinearRegression().fit(Xn, yn)
        pred = m.predict(X[:10])
        np.testing.assert_allclose(pred, y[:10], atol=0.5)

    def test_input_validation(self):
        with pytest.raises(ValueError):
            linalg.EncryptedLinearRegression().fit([], [])
        with pytest.raises(ValueError):
            linalg.EncryptedLinearRegression().fit(
                [np.ones((4, 2)), np.ones((4, 3))], [np.ones(4), np.ones(4)])


class TestCholeskyQR:
    def test_orthonormal_and_reconstructs(self):
        rng = np.random.default_rng(1)
        nodes = [rng.normal(size=(50, 3)) for _ in range(3)]
        Q_nodes, R = linalg.cholesky_qr(jax.random.PRNGKey(0), nodes)
        Q = np.concatenate([np.asarray(q) for q in Q_nodes])
        X = np.concatenate(nodes)
        np.testing.assert_allclose(Q.T @ Q, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(Q @ np.asarray(R), X, atol=1e-5)
        assert np.all(np.diag(np.asarray(R)) > 0)  # upper-triangular chol

    def test_inv_sym(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(5, 5))
        m = A @ A.T + 5 * np.eye(5)
        np.testing.assert_allclose(
            np.asarray(linalg.inv_sym(jnp.asarray(m))), np.linalg.inv(m), atol=1e-8)


class TestDASH:
    def test_scan_recovers_effects(self):
        rng = np.random.default_rng(3)
        n, m = 400, 6
        C = rng.normal(size=(n, 2))
        X = rng.normal(size=(n, m)) + C @ rng.normal(size=(2, m)) * 0.5
        true = np.zeros(m)
        true[1], true[4] = 1.2, -0.9
        y = X @ true + C @ np.array([0.3, -0.2]) + rng.normal(scale=0.2, size=n)
        idx = np.array_split(np.arange(n), 3)
        d = linalg.DASH().fit([X[i] for i in idx], [C[i] for i in idx],
                              [y[i] for i in idx])
        assert d.get_p_values()[1] < 1e-6 and d.get_p_values()[4] < 1e-6
        assert np.sign(d.get_coeff()[1]) > 0 > np.sign(d.get_coeff()[4])
        # marginal-scan coefficients of the null columns stay small
        null_cols = [0, 2, 3, 5]
        assert np.all(np.abs(d.get_coeff()[null_cols]) < 0.2)


class TestPATE:
    def test_votes_to_counts(self):
        preds = np.array([[0, 1, 2], [0, 1, 1], [0, 2, 1]])
        counts = pate.votes_to_counts(preds)
        np.testing.assert_array_equal(
            counts, [[3, 0, 0], [0, 2, 1], [0, 2, 1]])

    def test_q_bounds(self):
        # unanimous teachers -> tiny q; split vote -> capped q
        assert pate.compute_q_noisy_max([100, 0, 0], 0.5) < 1e-8
        assert pate.compute_q_noisy_max([10, 10, 10], 0.5) == pytest.approx(2 / 3)

    def test_logmgf_bounds_ordering(self):
        # data-dependent bound is never worse than the pure-eps bound
        for q in (0.0, 1e-4, 0.3, 0.9):
            for l in (1, 4, 8):
                assert pate.logmgf_exact(q, 0.2, l) <= 0.2 * l + 1e-12

    def test_consensus_beats_data_independent(self):
        rng = np.random.default_rng(4)
        n_teachers, n_examples = 50, 30
        # strong consensus: all teachers agree
        preds = np.tile(rng.integers(0, 3, n_examples), (n_teachers, 1))
        dep, ind = pate.perform_analysis(preds, np.arange(n_examples), 0.1)
        assert dep < ind
        assert dep > 0

    def test_disagreement_costs_privacy(self):
        rng = np.random.default_rng(5)
        n_examples = 30
        agree = np.tile(rng.integers(0, 3, n_examples), (60, 1))
        disagree = rng.integers(0, 3, (60, n_examples))
        dep_a, _ = pate.perform_analysis(agree, np.arange(n_examples), 0.1)
        dep_d, _ = pate.perform_analysis(disagree, np.arange(n_examples), 0.1)
        assert dep_a < dep_d

    def test_smoothed_sens_nonnegative_and_decaying(self):
        counts = np.array([40.0, 10.0, 5.0])
        s = pate.smoothed_sens(counts, 0.1, 2, beta=0.09)
        assert s >= 0
        assert pate.sens_at_k(counts, 0.1, 2, k=100) == 0.0

    def test_index_validation(self):
        preds = np.zeros((3, 4), np.int64)
        with pytest.raises(ValueError):
            pate.perform_analysis(preds, np.array([7]), 0.1)
