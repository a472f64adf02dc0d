"""Array / page-matrix utilities.

Reimplements the semantics of ``/root/reference/src/tsUtils.py`` (parity
citations inline) in modern numpy, without the reference's known bugs
(SURVEY.md §2.11): ``rmse_missing`` computes the *intended* masked RMSE
instead of always-NaN, and all randomness takes an explicit
``numpy.random.Generator`` so results are deterministic at any parallelism.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "array_to_matrix",
    "matrix_to_array",
    "matrix_from_svd",
    "pinverse_from_svd",
    "update_svd_folding_in",
    "update_svd_up",
    "rmse",
    "rmse_missing",
    "normalize",
    "unnormalize",
    "randomly_hide_values",
    "randomly_hide_consecutive",
    "nan_interpolate",
]


def array_to_matrix(arr: np.ndarray, n_rows: int, n_cols: int) -> np.ndarray:
    """Fold a 1-D series into an ``n_rows x n_cols`` page matrix, column-major:
    column j holds points ``[j*n_rows, (j+1)*n_rows)``.

    Parity: ``src/tsUtils.py:59-67`` (``np.reshape(arr, (nCols, nRows)).T``).
    """
    arr = np.asarray(arr, dtype=np.float64)
    if n_rows * n_cols != arr.size:
        raise ValueError(
            f"(n_rows * n_cols)={n_rows * n_cols} must equal len(arr)={arr.size}"
        )
    return arr.reshape(n_cols, n_rows).T


def matrix_to_array(matrix: np.ndarray) -> np.ndarray:
    """Unfold a page matrix back to the 1-D series (inverse of
    :func:`array_to_matrix`). Parity: ``flatten('F')`` at
    ``src/models/tsSVDModel.py:105-108``."""
    return np.asarray(matrix).flatten("F")


def matrix_from_svd(sk, Uk, Vk, probability: float = 1.0) -> np.ndarray:
    """Rank-k reconstruction ``(1/p) * Uk @ diag(sk) @ Vk.T``.

    ``Vk`` is column-orthonormal (already transposed, as stored by
    :class:`~tslib_ray.kernels.svd.SVDWrapper`). Parity: ``src/tsUtils.py:70-71``.
    """
    sk = np.asarray(sk, dtype=np.float64)
    return (1.0 / probability) * ((np.asarray(Uk) * sk) @ np.asarray(Vk).T)


def pinverse_from_svd(sk, Uk, Vk, probability: float = 1.0) -> np.ndarray:
    """Moore-Penrose pseudo-inverse from SVD factors: invert the nonzero
    singular values, swap U/V, scale by ``p``. Parity: ``src/tsUtils.py:73-80``
    (matches ``np.linalg.pinv`` for full-rank factor sets; validated in
    tests/test_kernels.py)."""
    s = np.array(sk, dtype=np.float64, copy=True)
    nz = s > 0.0
    s[nz] = 1.0 / s[nz]
    return probability * ((np.asarray(Vk) * s) @ np.asarray(Uk).T)


def update_svd_folding_in(D, uk, sk, vk):
    """Incremental SVD column-append ("folding-in"): project the new columns
    ``D`` (shape n x p) onto the fixed left factors and extend ``vk``; ``uk``
    and ``sk`` are unchanged. Parity: ``src/tsUtils.py:12-21``.

    Returns ``(uk, sk, vk_new)`` with ``vk_new`` of shape ``(m+p, k)``.
    """
    D = np.asarray(D, dtype=np.float64)
    proj = (D.T @ uk) / np.asarray(sk)  # p x k
    return uk, sk, np.vstack([vk, proj])


def update_svd_up(D, uk, sk, vk):
    """Proper rank-k additive SVD update (Brand-style "UP" method): QR of the
    residual ``(I - U U^T) D``, SVD of the small ``(k+p) x (k+p)`` core, rotate
    factors. Parity: ``src/tsUtils.py:24-57`` (including truncation back to
    rank k and the zero block-structure of the rotated factors).

    Returns ``(uk', sk', vk')`` with ``vk'`` of shape ``(m+p, k)``.
    """
    D = np.asarray(D, dtype=np.float64)
    uk = np.asarray(uk)
    vk = np.asarray(vk)
    k = len(sk)
    n, p = D.shape
    m = vk.shape[0]

    # residual of D outside span(uk); avoid the reference's O(n^2) eye(n) dot
    UtD = uk.T @ D  # k x p
    D_h = D - uk @ UtD
    Qd, Rd = np.linalg.qr(D_h)

    core = np.zeros((k + p, k + p))
    core[:k, :k] = np.diag(np.asarray(sk, dtype=np.float64))
    core[:k, k:] = UtD
    core[k:, k:] = Rd
    ui, si, vi = np.linalg.svd(core, full_matrices=False)

    uk_h = ui[:, :k]
    sk_h = si[:k]
    vk_h = vi[:k, :]  # k x (k+p)

    u_new = np.hstack([uk, Qd]) @ uk_h  # n x k

    # v basis: old vk columns stacked over identity for the new p columns
    v_basis = np.zeros((m + p, k + p))
    v_basis[:m, :k] = vk
    v_basis[m:, k:] = np.eye(p)
    v_new = v_basis @ vk_h.T  # (m+p) x k
    return u_new, sk_h, v_new


def rmse(a, b) -> float:
    """Root-mean-square error. Parity: ``src/tsUtils.py:83-84`` (reference uses
    sklearn, which is deliberately not a dependency here)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def rmse_missing(a, b) -> float:
    """RMSE of ``b`` against reconstruction restricted to positions where ``a``
    is NaN — the *intent* of ``src/tsUtils.py:87-99``, whose implementation
    appends the NaNs themselves and therefore always returns NaN (SURVEY.md
    §2.11.1). Here: error between ``b`` and 0 is meaningless without truth, so
    the engine's version takes ``a`` = truth-with-NaN-mask, ``b`` = estimates,
    and returns RMSE over the masked positions of a *third* implied truth; in
    practice callers pass (masked_truth, estimate, truth) via
    :func:`rmse_at_mask`."""
    raise NotImplementedError("use rmse_at_mask(mask, truth, estimate)")


def rmse_at_mask(mask: np.ndarray, truth, estimate) -> float:
    """RMSE between ``truth`` and ``estimate`` at positions where ``mask`` is
    True (the fixed version of ``src/tsUtils.py:87-99``)."""
    mask = np.asarray(mask, dtype=bool)
    return rmse(np.asarray(truth)[mask], np.asarray(estimate)[mask])


def normalize(arr, vmax: float, vmin: float):
    """Affine map ``[vmin, vmax] -> [-1, 1]``. Parity: ``src/tsUtils.py:102-108``."""
    mid = 0.5 * (vmin + vmax)
    half = 0.5 * (vmax - vmin)
    return (np.asarray(arr, dtype=np.float64) - mid) / half


def unnormalize(arr, vmax: float, vmin: float):
    """Inverse of :func:`normalize`. Parity: ``src/tsUtils.py:110-116``."""
    mid = 0.5 * (vmin + vmax)
    half = 0.5 * (vmax - vmin)
    return np.asarray(arr, dtype=np.float64) * half + mid


def randomly_hide_values(arr: np.ndarray, p_obs: float, rng: np.random.Generator):
    """Bernoulli mask: each entry independently becomes NaN with probability
    ``1 - p_obs``. Returns ``(masked_copy, observed_fraction)`` where
    observed_fraction follows the reference's convention ``1 - hidden/n``.
    Parity: ``src/tsUtils.py:119-128``, with an explicit seeded Generator
    (reference uses the global unseeded RNG — fixed per SURVEY.md §2.11.6).
    """
    arr = np.array(arr, dtype=np.float64, copy=True)
    hide = rng.uniform(0.0, 1.0, size=arr.size) > p_obs
    arr[hide] = np.nan
    return arr, 1.0 - hide.sum() / arr.size


def randomly_hide_consecutive(
    arr: np.ndarray,
    p_obs_row: float,
    longest_stretch: int,
    gap: int,
    rng: np.random.Generator,
):
    """Hide consecutive runs: stepping through the series in ``gap``-sized
    windows, with probability ``1 - p_obs_row`` blank a run of exactly
    ``longest_stretch`` entries at a uniform offset inside the window (clipped
    to the window end), stopping once the target hidden budget
    ``(1-p_obs_row)*n`` is exhausted. Returns ``(masked_copy, 1 - hidden/n)``.

    Parity: ``src/tsUtils.py:133-167`` (run length fixed, not random — the
    randomized variant is commented out in the reference at ``:147``).
    """
    arr = np.array(arr, dtype=np.float64, copy=True)
    n = arr.size
    values_to_hide = int((1.0 - p_obs_row) * n)
    count = 0
    i = 0
    while i < n:
        if rng.uniform(0.0, 1.0) > p_obs_row:
            to_hide = longest_stretch
            start = i + int(rng.uniform(0.0, 1.0) * (gap - to_hide))
            if to_hide + start > i + gap:
                to_hide = (i + gap) - start
            arr[start : start + to_hide] = np.nan
            count += to_hide
            values_to_hide -= to_hide
            if values_to_hide <= 0:
                break
        i += gap
    return arr, 1.0 - count / n


def nan_interpolate(arr: np.ndarray) -> np.ndarray:
    """Linear interpolation of NaNs over the non-NaN support (np.interp —
    endpoints extend flat). Parity: ``src/tsUtils.py:171-187``. Returns a new
    array (the reference mutates in place)."""
    arr = np.array(arr, dtype=np.float64, copy=True)
    nans = np.isnan(arr)
    if nans.any() and not nans.all():
        idx = np.arange(arr.size)
        arr[nans] = np.interp(idx[nans], idx[~nans], arr[~nans])
    return arr
