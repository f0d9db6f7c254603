"""PTCSolver unit tests (reference: src/clima_ptc.f90).

Covers both Jacobian modes (dense dgesv-style, compact-banded dgbsv-style,
clima_ptc.f90:694-725), the TSPSEUDO dt-update variants (:744-770), and
rollback on non-finite residuals (:773-799).
"""

import numpy as np
import pytest

from clima_tpu.solvers.ptc import PTCSolver, PTC_REASONS


def _tridiag_problem(n=12):
    """Stable nonlinear ODE rhs x' = f(x) with tridiagonal Jacobian.

    PTC integrates to the steady state of x' = f(x), so the Jacobian must be
    (negative) stable: f = -(A x + 0.1 tanh(x) - b) with A the 1-D Laplacian.
    """
    rng = np.random.default_rng(7)
    b = rng.uniform(0.5, 1.5, n)

    def f(x):
        r = np.empty(n)
        r[0] = 2 * x[0] - x[1] + 0.1 * np.tanh(x[0]) - b[0]
        r[1:-1] = (2 * x[1:-1] - x[:-2] - x[2:]
                   + 0.1 * np.tanh(x[1:-1]) - b[1:-1])
        r[-1] = 2 * x[-1] - x[-2] + 0.1 * np.tanh(x[-1]) - b[-1]
        return -r

    def jac_dense(x):
        d = 2.0 + 0.1 / np.cosh(x) ** 2
        J = np.diag(d)
        J += np.diag(-np.ones(n - 1), 1) + np.diag(-np.ones(n - 1), -1)
        return -J

    def jac_banded(x):
        # LAPACK compact layout ab[ku + i - j, j] = J[i, j], kl = ku = 1
        ab = np.zeros((3, n))
        ab[1, :] = -(2.0 + 0.1 / np.cosh(x) ** 2)
        ab[0, 1:] = 1.0   # superdiagonal J[i, i+1]
        ab[2, :-1] = 1.0  # subdiagonal  J[i+1, i]
        return ab

    return f, jac_dense, jac_banded


def test_dense_converges():
    f, jd, _ = _tridiag_problem()
    s = PTCSolver(np.zeros(12), f, jd, frtol=1e-12)
    reason = s.solve()
    assert reason > 0, PTC_REASONS.get(reason, reason)
    assert np.linalg.norm(f(s.x)) < 1e-10 * np.linalg.norm(f(np.zeros(12)))


def test_banded_matches_dense_iterates():
    f, jd, jb = _tridiag_problem()
    sd = PTCSolver(np.zeros(12), f, jd, frtol=1e-12)
    sb = PTCSolver(np.zeros(12), f, jb, frtol=1e-12,
                   jacobian_type="banded", kl=1, ku=1)
    # identical auto-dt0 (max |diag|) and identical linear algebra => the
    # entire iteration histories must coincide to roundoff
    assert sb.dt == pytest.approx(sd.dt, rel=1e-15)
    rd = sd.solve()
    rb = sb.solve()
    assert rd == rb and rd > 0
    assert sd.steps == sb.steps
    np.testing.assert_allclose(sb.x, sd.x, rtol=1e-12, atol=1e-13)


def test_increment_dt_from_initial_dt():
    f, jd, _ = _tridiag_problem()
    s = PTCSolver(np.zeros(12), f, jd, frtol=1e-12,
                  increment_dt_from_initial_dt=True)
    assert s.solve() > 0
    assert np.linalg.norm(f(s.x)) < 1e-9


def test_compute_dt_callback():
    f, jd, _ = _tridiag_problem()
    calls = []

    def compute_dt(solver):
        calls.append(solver.dt)
        return solver.dt * 2.0

    s = PTCSolver(np.zeros(12), f, jd, frtol=1e-12, compute_dt=compute_dt)
    assert s.solve() > 0
    assert len(calls) == s.steps


def test_rejection_rollback():
    n = 4
    calls = {"n": 0}

    def f(x):
        calls["n"] += 1
        if calls["n"] in (2, 3):
            return np.full(n, np.nan)  # forces rollback + dt halving
        return -(x - 1.0)

    def jac(x):
        return -np.eye(n)

    s = PTCSolver(np.full(n, 5.0), f, jac, dt=1.0, frtol=1e-12)
    assert s.solve() > 0
    np.testing.assert_allclose(s.x, 1.0, atol=1e-8)
    assert s.rejects_total == 2


def test_invalid_inputs():
    f = lambda x: x
    jac = lambda x: np.eye(2)
    with pytest.raises(ValueError):
        PTCSolver(np.zeros(2), f, jac, jacobian_type="banded")  # missing kl/ku
    with pytest.raises(ValueError):
        PTCSolver(np.zeros(2), f, jac, jacobian_type="sparse")
    with pytest.raises(ValueError):
        PTCSolver(np.zeros(2), f, jac, dt=-1.0)
    with pytest.raises(ValueError):
        PTCSolver(np.zeros(2), f, jac, dt_increment=0.0)
