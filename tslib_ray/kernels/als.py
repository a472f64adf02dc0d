"""Alternating least squares with missing-data mask (ALSWR).

Parity target: ``/root/reference/src/algorithms/alsWrapper.py`` (class
``ALSWrapper``): binary observation mask from NaNs with NaNs zero-filled
(``:21-27``), ``U,V`` initialised to ``midVal * uniform[0,1)`` (``:40-43``),
alternating masked ridge solves via pseudo-inverse (``:50-67``), stop when the
masked-MSE improvement drops below ``tol`` (``:70-78``).

Differences (documented, deliberate):
- seeded ``numpy.random.Generator`` instead of the reference's unseeded global
  RNG (SURVEY.md §2.11.6) — required for deterministic distributed runs;
- the per-row/per-column Python loops are replaced by batched einsum +
  batched ``np.linalg.pinv`` solves (same math, vectorized);
- no progress printing.
"""

from __future__ import annotations

import numpy as np


def _masked_ridge_solve(F: np.ndarray, W: np.ndarray, X: np.ndarray, lam: float):
    """For every row u solve ``(F diag(W[u]) F^T + lam I)^+ F diag(W[u]) X[u]``.

    F: (k, M) fixed factor; W, X: (n, M). Returns (n, k). This is the batched
    form of the reference's per-row loop (``alsWrapper.py:50-56``), using the
    same pinv-based solve.
    """
    k = F.shape[0]
    # A[u] = F @ diag(W[u]) @ F.T  -> (n, k, k)
    A = np.einsum("km,um,lm->ukl", F, W, F, optimize=True)
    A += lam * np.eye(k)
    # b[u] = F @ diag(W[u]) @ X[u] -> (n, k)
    b = np.einsum("km,um->uk", F, W * X, optimize=True)
    return np.einsum("ukl,ul->uk", np.linalg.pinv(A), b, optimize=True)


class ALSWrapper:
    def __init__(self, matrix: np.ndarray, rng: np.random.Generator | None = None):
        matrix = np.array(matrix, dtype=np.float64, copy=True)
        if matrix.ndim != 2:
            raise ValueError("ALSWrapper requires a 2-D matrix")
        mask = np.isnan(matrix)
        self.W = (~mask).astype(np.float64)
        matrix[mask] = 0.0
        self.matrix = matrix
        self.N, self.M = matrix.shape
        self.rng = rng if rng is not None else np.random.default_rng(0)

    def decompose(self, k: int, lam: float, iterations: int, tol: float):
        """Run ALSWR; returns ``(U, V)`` with U (N,k), V (k,M).

        Stopping rule matches ``alsWrapper.py:70-78``: break when
        ``|err - pastError| < tol`` computed on the masked MSE.
        """
        # init scale: the reference uses midVal = (max+min)/2
        # (alsWrapper.py:40-43), which is ~0 for centered/normalized data and
        # collapses the iteration to all-zeros (pinv(0)=0). Deviation: fall
        # back to the half-range when the mid-value degenerates.
        mid = 0.5 * (np.max(self.matrix) + np.min(self.matrix))
        if abs(mid) < 1e-12:
            mid = 0.5 * (np.max(self.matrix) - np.min(self.matrix)) or 1.0
        U = mid * self.rng.random((self.N, k))
        V = mid * self.rng.random((k, self.M))

        past_err = np.inf
        for _ in range(iterations):
            U = _masked_ridge_solve(V, self.W, self.matrix, lam)
            V = _masked_ridge_solve(U.T, self.W.T, self.matrix.T, lam).T
            err = self.get_error(self.matrix, U, V, self.W)
            if abs(err - past_err) < tol:
                break
            past_err = err
        return U, V

    def reconstruct(self, k: int, lam: float, return_matrix: bool = True,
                    iterations: int = 1000, tol: float = 1e-6):
        """Parity: ``alsWrapper.py:88-94``."""
        U, V = self.decompose(k, lam, iterations, tol)
        return U @ V if return_matrix else (U, V)

    @staticmethod
    def get_error(Q, U, V, W) -> float:
        """Masked MSE ``mean((W * (Q - U@V))**2)`` — ``alsWrapper.py:98-99``."""
        return float(np.mean((W * (Q - U @ V)) ** 2))
