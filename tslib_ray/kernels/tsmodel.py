"""Page-matrix time-series models (truncated-SVD and ALS variants).

Parity target: ``/root/reference/src/models/tsSVDModel.py`` (class ``SVDModel``)
and ``/root/reference/src/models/tsALSModel.py`` (class ``ALSModel``). These are
*per-group* kernels: in the engine one model instance lives inside a grouped
Arrow UDF (one conversation / panel per group) — never a distributed matrix.

Semantics reproduced exactly (see tests/test_kernels.py):
- ``_assign_data``: global (whole-frame) mid-range NaN fill ``(nanmin+nanmax)/2``
  (``tsSVDModel.py:142-148``), truncation to the *last* ``N*M`` points per
  series (``:165,170``), donor blocks stacked first and the target series block
  last, with the final row saved as ``last_row_observations`` (``:156-173``).
- ``fit``: full SVD -> top-k -> the data matrix is *overwritten* by the rank-k
  reconstruction (``:180-190``) -> regression weights.
- ``_compute_weights``: drop the target's last row (and, when
  ``include_past_data_only``, each donor's N-th row), re-SVD the submatrix
  top-k, ``weights = pinv(sub)^T @ last_row`` (``:54-93``).
- ``predict``: one-step forecast ``weights . [donor windows | target window]``
  (``:250-284``).
- incremental ``update`` via folding-in / rank-k additive update
  (``:194-232``), including the mid-range fill of the new block (0 when
  all-NaN) and the append to ``last_row_observations``.
- ALS variant (``tsALSModel.py``): fit keeps NaNs (``:71``), reconstructs by
  ALSWR with ``lam=0, tol=1e-9`` (``:77-78``), clips to the input's
  ``[nanmin, nanmax]`` (``:73-74,82-83``), back-fills remaining NaNs in the
  last row from the reconstruction (``:85-89``), and computes weights with a
  direct ``np.linalg.pinv`` (``tsALSModel.py:33-63``). The reference's broken
  ``ALSModel.updateSVD`` arity (SURVEY.md §2.11.3) is *not* replicated —
  updates route through the shared :meth:`SVDModel.update`.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from . import tsutils
from .als import ALSWrapper
from .svd import SVDWrapper


class SVDModel:
    def __init__(
        self,
        series_to_predict_key: str,
        k_singular_values: int,
        N: int,
        M: int,
        prob_observation: float = 1.0,
        other_series_keys: Sequence[str] = (),
        include_past_data_only: bool = True,
    ):
        self.key = series_to_predict_key
        self.other_keys = list(other_series_keys)
        self.include_past_data_only = include_past_data_only
        self.N = int(N)
        self.M = int(M)
        self.k = int(k_singular_values)
        self.p = float(prob_observation)

        self.matrix: np.ndarray | None = None
        self.last_row_observations: np.ndarray | None = None
        self.Uk = self.sk = self.Vk = None          # factors of the full matrix
        self.Ukw = self.skw = self.Vkw = None       # factors of the weights submatrix
        self.weights: np.ndarray | None = None
        self.times_updated = 0

    # ---- data assembly ---------------------------------------------------

    def _assign_data(self, key_to_series: Mapping[str, np.ndarray],
                     missing_value_fill: bool = True) -> None:
        """Stack folded per-series page matrices (donors first, target last).
        Parity: ``tsSVDModel.py:134-173``."""
        all_keys = self.other_keys + [self.key]
        for k in all_keys:
            if k not in key_to_series:
                raise KeyError(f"series {k!r} missing from input")

        series = {k: np.asarray(key_to_series[k], dtype=np.float64) for k in all_keys}
        T = self.N * self.M
        for k, v in series.items():
            if v.size < T:
                raise ValueError(f"all series must have length >= {T}")

        if missing_value_fill:
            # global mid-range over ALL series, as in the reference's
            # whole-DataFrame nanmin/nanmax (tsSVDModel.py:142-148)
            stacked = np.concatenate([v for v in series.values()])
            fill = 0.5 * (np.nanmin(stacked) + np.nanmax(stacked))
            series = {k: np.where(np.isnan(v), fill, v) for k, v in series.items()}

        blocks = [tsutils.array_to_matrix(series[k][-T:], self.N, self.M)
                  for k in all_keys]
        self.matrix = np.vstack(blocks)
        self.last_row_observations = self.matrix[-1, :].copy()

    # ---- weights regression ----------------------------------------------

    def _weights_submatrix(self) -> np.ndarray:
        """All rows except the target's last; with ``include_past_data_only``
        also drop each donor's N-th row. Parity: ``tsSVDModel.py:66-87``."""
        n_donor = len(self.other_keys)
        if not self.include_past_data_only:
            return self.matrix[: n_donor * self.N + self.N - 1, :]
        rows = []
        for b in range(n_donor + 1):
            rows.append(self.matrix[b * self.N : b * self.N + self.N - 1, :])
        return np.vstack(rows) if rows else self.matrix[:0, :]

    def _compute_weights(self) -> None:
        """Parity: ``tsSVDModel.py:54-93`` (re-SVD the submatrix top-k, then
        ``weights = pinv^T @ last_row``)."""
        if self.last_row_observations is None:
            raise RuntimeError("_compute_weights requires fitted data")
        sub = self._weights_submatrix()
        self.skw, self.Ukw, self.Vkw = SVDWrapper(sub).reconstruct(self.k)
        pinv = tsutils.pinverse_from_svd(self.skw, self.Ukw, self.Vkw,
                                         probability=self.p)
        self.weights = pinv.T @ self.last_row_observations

    # ---- fit / outputs ----------------------------------------------------

    def fit(self, key_to_series: Mapping[str, np.ndarray]) -> "SVDModel":
        """Parity: ``tsSVDModel.py:180-190``."""
        self._assign_data(key_to_series, missing_value_fill=True)
        self.sk, self.Uk, self.Vk = SVDWrapper(self.matrix).reconstruct(self.k)
        self.matrix = tsutils.matrix_from_svd(self.sk, self.Uk, self.Vk,
                                              probability=self.p)
        self._compute_weights()
        return self

    def denoised(self) -> dict[str, np.ndarray]:
        """Imputed/denoised series per key (page blocks unfolded column-major).
        Parity: ``tsSVDModel.py:96-110``."""
        out = {}
        for i, k in enumerate(self.other_keys + [self.key]):
            block = self.matrix[i * self.N : (i + 1) * self.N, :]
            out[k] = tsutils.matrix_to_array(block)
        return out

    def denoised_ts(self, ind, is_range: bool = True) -> np.ndarray:
        """Reconstruct from current factors, unfold, slice. Parity intent of
        ``tsSVDModel.py:112-120`` with the py2-only ``flatten(1)`` replaced by
        the correct column-major unfold (SURVEY.md §2.11.4)."""
        full = tsutils.matrix_to_array(
            tsutils.matrix_from_svd(self.sk, self.Uk, self.Vk, probability=self.p))
        if is_range:
            lo, hi = ind
            return full[lo:hi]
        return full[np.asarray(ind)]

    # ---- incremental updates ----------------------------------------------

    def update(self, D: np.ndarray, method: str = "folding-in",
               missing_value_fill: bool = True) -> None:
        """Append new data (length divisible by N, at most N columns) to the
        factor state and refresh the regression weights.
        Parity: ``tsSVDModel.py:194-232``."""
        D = np.array(D, dtype=np.float64, copy=True).ravel()
        if D.size % self.N != 0:
            raise ValueError("len(D) must be divisible by N")
        if missing_value_fill and np.isnan(D).any():
            vmax = np.nanmax(D) if not np.isnan(D).all() else 0.0
            vmin = np.nanmin(D) if not np.isnan(D).all() else 0.0
            D[np.isnan(D)] = 0.5 * (vmin + vmax)
        D = D.reshape(self.N, D.size // self.N)
        if D.shape[1] > D.shape[0]:
            raise ValueError("at most N new columns per update")

        if method == "UP":
            self.Uk, self.sk, self.Vk = tsutils.update_svd_up(
                D, self.Uk, self.sk, self.Vk)
            self.Ukw, self.skw, self.Vkw = tsutils.update_svd_up(
                D[:-1, :], self.Ukw, self.skw, self.Vkw)
        elif method == "folding-in":
            self.Uk, self.sk, self.Vk = tsutils.update_svd_folding_in(
                D, self.Uk, self.sk, self.Vk)
            self.Ukw, self.skw, self.Vkw = tsutils.update_svd_folding_in(
                D[:-1, :], self.Ukw, self.skw, self.Vkw)
        else:
            raise ValueError(f"unknown update method {method!r}")
        self.M = self.Vk.shape[0]
        self.times_updated += 1

        pinv = tsutils.pinverse_from_svd(self.skw, self.Ukw, self.Vkw,
                                         probability=self.p)
        self.last_row_observations = np.append(self.last_row_observations,
                                               D[-1, :])
        self.weights = pinv.T @ self.last_row_observations

    def denoised_new(self, D: np.ndarray, method: str = "folding-in",
                     missing_value_fill: bool = True) -> np.ndarray:
        """Incremental denoise of just-appended columns.
        Parity: ``tsSVDModel.py:123-129``."""
        n_new = np.asarray(D).size // self.N
        self.update(D, method=method, missing_value_fill=missing_value_fill)
        new_cols = tsutils.matrix_from_svd(
            self.sk, self.Uk, self.Vk[-n_new:, :], probability=self.p)
        return tsutils.matrix_to_array(new_cols)

    # ---- forecasting -------------------------------------------------------

    def predict(self, other_series_new: Mapping[str, np.ndarray],
                predict_series_new: Mapping[str, np.ndarray]) -> float:
        """One-step forecast: dot the learned weights with the concatenated
        most-recent windows (donors first: N-1 points, or N when
        ``include_past_data_only=False``; target last: N-1 points).
        Parity: ``tsSVDModel.py:250-284``."""
        if self.weights is None:
            raise RuntimeError("fit() before predict()")
        need = self.N - 1 if self.include_past_data_only else self.N
        parts = []
        for k in self.other_keys:
            v = np.asarray(other_series_new[k], dtype=np.float64)
            if v.size < need:
                raise ValueError(f"series {k!r} must have length >= {need}")
            parts.append(v[-need:] if need > 0 else v[:0])
        t = np.asarray(predict_series_new[self.key], dtype=np.float64)
        if t.size < self.N - 1:
            raise ValueError(f"series {self.key!r} must have length >= {self.N - 1}")
        parts.append(t[t.size - (self.N - 1):])
        vec = np.concatenate(parts) if parts else np.empty(0)
        return float(self.weights @ vec)


class ALSModel(SVDModel):
    """ALS-imputation variant. Parity: ``/root/reference/src/models/tsALSModel.py``."""

    def __init__(self, series_to_predict_key, k_factors, N, M,
                 prob_observation=1.0, other_series_keys=(),
                 include_past_data_only=True,
                 rng: np.random.Generator | None = None):
        super().__init__(series_to_predict_key, k_factors, N, M,
                         prob_observation=prob_observation,
                         other_series_keys=other_series_keys,
                         include_past_data_only=include_past_data_only)
        self.rng = rng if rng is not None else np.random.default_rng(0)

    def _compute_weights(self) -> None:
        """Direct ``np.linalg.pinv`` on the submatrix (no truncated-SVD
        detour). Parity: ``tsALSModel.py:33-63``."""
        if self.last_row_observations is None:
            raise RuntimeError("_compute_weights requires fitted data")
        sub = self._weights_submatrix()
        self.weights = np.linalg.pinv(sub).T @ self.last_row_observations

    def fit(self, key_to_series: Mapping[str, np.ndarray]) -> "ALSModel":
        """Parity: ``tsALSModel.py:68-92`` (keep NaNs; ALSWR with lam=0,
        tol=1e-9; clip to input range; back-fill last-row NaNs)."""
        self._assign_data(key_to_series, missing_value_fill=False)
        vmax = np.nanmax(self.matrix)
        vmin = np.nanmin(self.matrix)
        als = ALSWrapper(self.matrix, rng=self.rng)
        U, V = als.reconstruct(self.k, 0.0, return_matrix=False, tol=1e-9)
        self.matrix = np.clip(U @ V, vmin, vmax)
        nan_last = np.isnan(self.last_row_observations)
        self.last_row_observations[nan_last] = self.matrix[-1, nan_last]
        self._compute_weights()
        return self
