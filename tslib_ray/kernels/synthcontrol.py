"""Robust Synthetic Control (RSC) and multi-metric RSC (mRSC).

Parity target: ``/root/reference/src/synthcontrol/syntheticControl.py`` and
``/root/reference/src/synthcontrol/multisyntheticControl.py`` — thin wrappers
over the page-matrix models with ``N = 1`` (one unit per row,
``syntheticControl.py:31``) and ``include_past_data_only=False`` (``:39-46``).
The reference file is Python-2-only (mixed tabs, ``getControl`` missing
``self`` — SURVEY.md §2.11.2); the semantics here follow its obvious intent.

In the engine a panel is long-format rows ``(unit, metric, t, value)``; one
RSC problem = one group, solved inside a grouped UDF
(:mod:`tslib_ray.stages.panel`).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from .tsmodel import ALSModel, SVDModel


class RobustSyntheticControl:
    def __init__(self, series_to_predict_key: str, k_singular_values: int,
                 M: int, prob_observation: float = 1.0,
                 model_type: str = "svd",
                 other_series_keys: Sequence[str] = (),
                 rng: np.random.Generator | None = None):
        self.key = series_to_predict_key
        self.other_keys = list(other_series_keys)
        self.N = 1  # each series is its own row (syntheticControl.py:31)
        self.M = int(M)
        self.k = int(k_singular_values)
        self.p = float(prob_observation)
        if model_type == "als":
            self.model: SVDModel = ALSModel(
                self.key, self.k, self.N, self.M, prob_observation=self.p,
                other_series_keys=self.other_keys,
                include_past_data_only=False, rng=rng)
        else:
            self.model = SVDModel(
                self.key, self.k, self.N, self.M, prob_observation=self.p,
                other_series_keys=self.other_keys,
                include_past_data_only=False)

    def fit(self, key_to_series: Mapping[str, np.ndarray]) -> "RobustSyntheticControl":
        """Fit on the pre-intervention panel. Parity: ``syntheticControl.py:54-56``."""
        self.model.fit(key_to_series)
        return self

    def predict(self, other_series_new: Mapping[str, np.ndarray]) -> np.ndarray:
        """Counterfactual for all post-intervention periods at once:
        ``weights . donor_panel``. Parity: ``syntheticControl.py:62-64``."""
        donors = np.vstack([np.asarray(other_series_new[k], dtype=np.float64)
                            for k in self.other_keys])
        return self.model.weights @ donors

    def get_control(self) -> np.ndarray:
        """Learned donor weights. Parity intent of ``syntheticControl.py:67-73``
        (broken in the reference — missing ``self``)."""
        if self.model.weights is None:
            raise RuntimeError("fit() before get_control()")
        return self.model.weights

    def denoised(self) -> dict[str, np.ndarray]:
        return self.model.denoised()


class MultiRobustSyntheticControl(RobustSyntheticControl):
    """mRSC: concatenate per-metric panels along time, each scaled by
    ``sqrt(weight)``. Parity: ``multisyntheticControl.py:29-104``."""

    def __init__(self, nbr_metrics: int, weights_array: Sequence[float],
                 series_to_predict_key: str, k_singular_values: int, M: int,
                 prob_observation: float = 1.0, model_type: str = "svd",
                 other_series_keys: Sequence[str] = (),
                 rng: np.random.Generator | None = None):
        if len(weights_array) != nbr_metrics:
            raise ValueError("len(weights_array) must equal nbr_metrics")
        self.nbr_metrics = int(nbr_metrics)
        self.weights_array = [float(w) for w in weights_array]
        self.combined_M = self.nbr_metrics * int(M)
        super().__init__(series_to_predict_key, k_singular_values,
                         self.combined_M, prob_observation=prob_observation,
                         model_type=model_type,
                         other_series_keys=other_series_keys, rng=rng)

    def combine_metrics(self, per_metric: Sequence[Mapping[str, np.ndarray]],
                        for_training: bool) -> dict[str, np.ndarray]:
        """Scale metric i by ``sqrt(w_i)`` and concatenate each unit's
        per-metric series along time. Training includes the treated key,
        prediction excludes it. Parity: ``multisyntheticControl.py:49-73``."""
        if len(per_metric) != self.nbr_metrics:
            raise ValueError("need one key->series mapping per metric")
        keys = ([self.key] + self.other_keys) if for_training else self.other_keys
        out = {}
        for k in keys:
            out[k] = np.concatenate([
                np.sqrt(self.weights_array[i])
                * np.asarray(per_metric[i][k], dtype=np.float64)
                for i in range(self.nbr_metrics)
            ])
        return out

    def fit(self, per_metric: Sequence[Mapping[str, np.ndarray]]):
        """Parity: ``multisyntheticControl.py:82-83``."""
        super().fit(self.combine_metrics(per_metric, for_training=True))
        return self

    def predict(self, per_metric_new: Sequence[Mapping[str, np.ndarray]]):
        """Predict on combined metrics, split back into per-metric slices.
        Parity: ``multisyntheticControl.py:96-104``."""
        all_preds = super().predict(self.combine_metrics(per_metric_new,
                                                         for_training=False))
        L = len(all_preds) // self.nbr_metrics
        return [all_preds[i * L : (i + 1) * L] for i in range(self.nbr_metrics)]
