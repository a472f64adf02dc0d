"""Truncated-SVD solver.

Parity target: ``/root/reference/src/algorithms/svdWrapper.py`` (class
``SVDWrapper``): full thin SVD with V stored transposed (column-orthonormal,
``:33-38``), top-k truncation with clamping (``k < 1`` -> empty, ``k >
min(N,M)`` -> ``min(N,M)``, ``:41-58``), lazy decomposition, and rank-k
reconstruction (``:62-68``).
"""

from __future__ import annotations

import numpy as np

from . import tsutils


class SVDWrapper:
    def __init__(self, matrix: np.ndarray, method: str = "numpy"):
        matrix = np.asarray(matrix, dtype=np.float64)
        if matrix.ndim != 2:
            raise ValueError("SVDWrapper requires a 2-D matrix")
        self.matrix = matrix
        self.N, self.M = matrix.shape
        self.method = "numpy"  # only supported method, as in the reference
        self.U: np.ndarray | None = None
        self.s: np.ndarray | None = None
        self.V: np.ndarray | None = None

    def decompose(self) -> None:
        """Full thin SVD; ``self.V`` holds the *right* singular vectors as
        columns (reference transposes LAPACK's Vt at ``svdWrapper.py:38``)."""
        U, s, Vt = np.linalg.svd(self.matrix, full_matrices=False)
        self.U, self.s, self.V = U, s, Vt.T

    def decompose_top_k(self, k: int):
        """Top-k factors ``(sk, Uk, Vk)`` with the reference's clamping
        (``svdWrapper.py:41-58``)."""
        if k < 1:
            return (np.array([]), np.empty((self.N, 0)), np.empty((self.M, 0)))
        k = min(k, self.N, self.M)
        if self.U is None:
            self.decompose()
        return (self.s[:k], self.U[:, :k], self.V[:, :k])

    def reconstruct(self, k: int, return_matrix: bool = False):
        """Rank-k factors, or the reconstructed matrix when ``return_matrix``
        (``svdWrapper.py:62-68``)."""
        sk, Uk, Vk = self.decompose_top_k(k)
        if return_matrix:
            return tsutils.matrix_from_svd(sk, Uk, Vk)
        return (sk, Uk, Vk)
