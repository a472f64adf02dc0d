"""Mixture time-series fixture (FIXTURES.md F2/F3): the reference's
ARMA + harmonics + trend process with seeded masking, used for imputation /
forecast parity tests.

Parameters pinned to ``/root/reference/tests/testScriptSingleTimeseries.py``:
ARMA ar=[0.4,0.3,0.2], ma=[0.5,0.1], N(0,1) noise (``:33-40``); sine coeffs
[-2,3] periods [26,30], cosine [-2.5] period [16] (``:66-70``); trend
power=0.35, displacement=-2.5 (``:46-48``); normalize to [-1,1] over the
union range of observed and mean series (``:105-113``); Bernoulli +
consecutive-run masking (``:123-127``).
"""

from __future__ import annotations

import numpy as np

from ..kernels import generators, tsutils


def mixture_series(time_steps: int, seed: int = 42):
    """Returns ``(observed, mean)`` normalized to [-1, 1]."""
    rng = np.random.default_rng(seed)
    ar = [0.4, 0.3, 0.2]
    ma = [0.5, 0.1]
    start = np.zeros(max(len(ar), len(ma)))
    arma_obs, arma_mean, _ = generators.generate_arma(
        ar, ma, start, time_steps, 0.0, 1.0, rng)
    harm = generators.generate_harmonics([-2.0, 3.0], [26.0, 30.0],
                                         [-2.5], [16.0], time_steps)
    trend = generators.generate_trend(generators.linear_trend, power=0.35,
                                      displacement=-2.5,
                                      time_steps=time_steps)
    obs = harm + trend + arma_obs
    mean = harm + trend + arma_mean
    vmax = max(np.nanmax(obs), np.nanmax(mean))
    vmin = min(np.nanmin(obs), np.nanmin(mean))
    return (tsutils.normalize(obs, vmax, vmin),
            tsutils.normalize(mean, vmax, vmin))


def masked_mixture(time_steps: int, N: int, M: int, p_obs: float = 0.7,
                   seed: int = 42):
    """Train series with Bernoulli + consecutive-run masking applied
    (mirroring ``testScriptSingleTimeseries.py:119-127``).

    Returns ``(masked, observed, mean)`` of length ``time_steps``.
    """
    obs, mean = mixture_series(time_steps, seed)
    rng = np.random.default_rng(seed + 1)
    masked, _ = tsutils.randomly_hide_values(obs, p_obs, rng)
    masked, _ = tsutils.randomly_hide_consecutive(
        masked, 0.9, longest_stretch=int(M * 0.25), gap=M, rng=rng)
    return masked, obs, mean
