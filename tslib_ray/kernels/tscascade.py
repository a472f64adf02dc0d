"""TSmodel — sliding ensemble of page-matrix sub-models over an unbounded
series (incremental imputation + forecasting).

The reference imports ``tslib.src.models.TSModel.TSmodel`` whose source is
**absent from the checkout** (SURVEY.md §2.10); these are its *observable*
semantics reconstructed from the call sites
(``/root/reference/tests/testScriptSingleTimeSeriesMultipleModels.py:15-50``):

    TSmodel(k, L, gamma, T0, rectFactor=10)
    .update_model(points)   # feed any number of new points, in order
    .m_update_index         # number of points incorporated (denoisable prefix)
    .denoise_ts()           # denoised series for the incorporated prefix
    .predict(last_points, no_models=10)   # mean 1-step forecast of the last
                                          # no_models fitted sub-models

Reconstruction assumptions (documented, pinned by tests):

- each sub-model is an ``SVDModel`` page matrix with ``N = L`` rows and up to
  ``M_max = rectFactor * L`` columns, so a full sub-model spans
  ``T_sub = rectFactor * L**2`` points;
- sub-model i starts at ``i * T_sub/2`` (half-overlapping windows);
- a sub-model first fits once >= ``T0`` points of its window are available
  (only whole L-point columns are used);
- thereafter new whole columns are appended by folding-in
  (``src/tsUtils.py:12-21``); when the points added since the last full fit
  exceed ``gamma`` x the points at that fit, the sub-model is re-fitted from
  scratch (the reference's TimesReconstructed/TimesUpdated counters);
- ``denoise_ts`` stitches sub-model outputs by ownership: sub-model i owns
  ``[i*T_half, (i+1)*T_half)`` (the last model owns through its fitted end);
- ``predict`` averages the one-step forecasts of the last ``no_models``
  fitted sub-models, each dotted with the caller-provided last ``L-1`` points
  (per the call site, which passes ``trainData[i-L+1:i]``).

In the engine this kernel runs per conversation key: batch path =
``groupby(key).map_groups`` (tslib_ray.stages.incremental), streaming path =
key-sharded Ray actors fed in ts order.
"""

from __future__ import annotations

import numpy as np

from .tsmodel import SVDModel


class _SubModel:
    __slots__ = ("start", "model", "cols_fitted", "points_at_fit",
                 "points_since_fit", "times_reconstructed", "times_updated")

    def __init__(self, start: int):
        self.start = start
        self.model: SVDModel | None = None
        self.cols_fitted = 0          # whole columns currently incorporated
        self.points_at_fit = 0
        self.points_since_fit = 0
        self.times_reconstructed = 0
        self.times_updated = 0


class TSModelEnsemble:
    def __init__(self, k: int, L: int, gamma: float, T0: int,
                 rect_factor: int = 10):
        self.k = int(k)
        self.L = int(L)
        self.gamma = float(gamma)
        self.T0 = int(T0)
        self.rect_factor = int(rect_factor)
        self.M_max = self.rect_factor * self.L
        self.T_sub = self.M_max * self.L
        self.T_half = self.T_sub // 2
        self.buffer = np.empty(0, dtype=np.float64)
        self.models: list[_SubModel] = []
        self.m_update_index = 0

    # -- internals ----------------------------------------------------------

    def _ensure_models(self) -> None:
        """One sub-model per half-window start whose window already holds at
        least T0 points."""
        n = self.buffer.size
        if not self.models:
            self.models.append(_SubModel(0))
        while n - (self.models[-1].start + self.T_half) >= self.T0:
            self.models.append(_SubModel(self.models[-1].start + self.T_half))

    def _advance(self, sub: _SubModel) -> None:
        """Incorporate all available whole columns of ``sub``'s window."""
        n = self.buffer.size
        avail = min(n - sub.start, self.T_sub)
        if avail < max(self.T0, 2 * self.L):
            return
        cols_avail = avail // self.L
        if cols_avail <= sub.cols_fitted:
            return
        new_points = (cols_avail - sub.cols_fitted) * self.L

        needs_full_fit = (
            sub.model is None
            or sub.points_since_fit + new_points
            > self.gamma * max(1, sub.points_at_fit)
            or sub.cols_fitted < self.k  # folding-in needs >= k columns
        )
        window = self.buffer[sub.start: sub.start + cols_avail * self.L]
        if needs_full_fit:
            m = SVDModel("s", min(self.k, self.L, cols_avail), self.L,
                         cols_avail)
            m.fit({"s": window})
            sub.model = m
            sub.points_at_fit = window.size
            sub.points_since_fit = 0
            sub.times_reconstructed += 1
        else:
            # fold in the new whole columns, at most L columns per update
            # (tsSVDModel.py:207-208 requires D.shape[1] <= N)
            pos = sub.cols_fitted * self.L
            while pos < cols_avail * self.L:
                chunk = window[pos: pos + self.L * self.L]
                sub.model.update(chunk, method="folding-in")
                sub.times_updated += 1
                pos += chunk.size
            sub.points_since_fit += new_points
        sub.cols_fitted = cols_avail

    # -- public API ---------------------------------------------------------

    def update_model(self, points: np.ndarray) -> None:
        pts = np.asarray(points, dtype=np.float64).ravel()
        self.buffer = np.concatenate([self.buffer, pts])
        self._ensure_models()
        for sub in self.models:
            self._advance(sub)
        fitted = [s for s in self.models if s.model is not None]
        self.m_update_index = (
            max(s.start + s.cols_fitted * self.L for s in fitted)
            if fitted else 0)

    def denoise_ts(self) -> np.ndarray:
        """Stitched denoised prefix ``[0, m_update_index)``."""
        out = np.full(self.m_update_index, np.nan)
        # models are written in window order; in the half-overlap the LATER
        # model wins (it was fitted on the overlap plus newer context)
        for sub in self.models:
            if sub.model is None:
                continue
            den = sub.model.denoised()["s"]
            hi = min(sub.start + den.size, out.size)
            if hi > sub.start:
                out[sub.start:hi] = den[: hi - sub.start]
        return out

    def predict(self, last_points: np.ndarray, no_models: int = 10) -> float:
        fitted = [s for s in self.models if s.model is not None]
        if not fitted:
            raise RuntimeError("no fitted sub-models yet")
        use = fitted[-no_models:]
        lp = np.asarray(last_points, dtype=np.float64)[-(self.L - 1):]
        preds = [s.model.predict({}, {"s": lp}) for s in use]
        return float(np.mean(preds))
