"""Native C++ sparse LU vs numpy dense solve."""

import numpy as np
import pytest

from toyspice_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_dense_random():
    rng = np.random.default_rng(42)
    for n in (3, 8, 20):
        a = rng.normal(size=(n, n)) + np.eye(n) * 0.5
        b = rng.normal(size=n)
        s = native.SparseSolver(n)
        s.add_matrix(a)
        assert s.factor()
        x = s.solve(b)
        np.testing.assert_allclose(a @ x, b, atol=1e-10)


def test_mna_like_zero_diagonal():
    """V-source branch rows have zero diagonals — pivoting must handle it."""
    # divider: [g1+g2? ...] small MNA: nodes 1,2 + branch
    g = 1e-3
    a = np.array([
        [g, -g, 1.0],
        [-g, 2 * g, 0.0],
        [1.0, 0.0, 0.0],
    ])
    b = np.array([0.0, 0.0, 10.0])
    s = native.SparseSolver(3)
    s.add_matrix(a)
    assert s.factor()
    x = s.solve(b)
    np.testing.assert_allclose(a @ x, b, atol=1e-12)
    assert x[0] == pytest.approx(10.0)


def test_sparse_structure_and_refactor():
    rng = np.random.default_rng(1)
    n = 50
    a = np.zeros((n, n))
    # tridiagonal + a few random couplings (fill-in exercise)
    for i in range(n):
        a[i, i] = 4.0
        if i > 0:
            a[i, i - 1] = -1.0
            a[i - 1, i] = -1.0
    for _ in range(20):
        i, j = rng.integers(0, n, size=2)
        a[i, j] += 0.3
    b = rng.normal(size=n)
    s = native.SparseSolver(n)
    s.add_matrix(a)
    assert s.factor()
    x = s.solve(b)
    np.testing.assert_allclose(a @ x, b, atol=1e-9)

    # clear + restamp (the per-NR-iteration cycle of the reference)
    s.clear()
    a2 = a + np.diag(np.full(n, 0.5))
    s.add_matrix(a2)
    assert s.factor()
    x2 = s.solve(b)
    np.testing.assert_allclose(a2 @ x2, b, atol=1e-9)


def test_singular_detected():
    s = native.SparseSolver(3)
    s.add(0, 0, 1.0)
    s.add(1, 1, 1.0)
    # row 2 empty -> structurally singular
    assert not s.factor()
