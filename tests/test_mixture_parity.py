"""Reference-test parity on the mixture fixture (SURVEY.md §3.1 / §5.2):
imputation + forecasting quality thresholds mirroring
``/root/reference/tests/testScriptSingleTimeseries.py:156-195``, plus the
TSmodel sliding-ensemble incremental path (§2.10). No Ray needed."""

import numpy as np
import pytest

from tslib_ray.kernels import tsutils
from tslib_ray.kernels.tscascade import TSModelEnsemble
from tslib_ray.kernels.tsmodel import ALSModel, SVDModel
from tslib_ray.sources.mixture import masked_mixture, mixture_series

N, M, K = 50, 160, 5
T = N * M


@pytest.fixture(scope="module")
def fixture():
    return masked_mixture(T, N, M, p_obs=0.7, seed=42)


def test_svd_imputation_beats_observation_noise(fixture):
    masked, obs, mean = fixture
    mask = np.isnan(masked)
    model = SVDModel("t1", K, N, M).fit({"t1": masked})
    den = model.denoised()["t1"]
    # overall denoising quality (the reference's printed RMSE-vs-mean,
    # testScriptSingleTimeseries.py:161)
    assert tsutils.rmse(den, mean) < 0.2
    assert tsutils.rmse(den, obs) < 0.35
    # low-rank imputation at masked positions beats the mid-range fill it
    # starts from
    fill = 0.5 * (np.nanmin(masked) + np.nanmax(masked))
    err_svd = tsutils.rmse_at_mask(mask, mean, den)
    err_mid = tsutils.rmse(mean[mask], np.full(mask.sum(), fill))
    assert err_svd < 0.7 * err_mid


def test_als_imputation(fixture):
    masked, obs, mean = fixture
    model = ALSModel("t1", K, N, M, rng=np.random.default_rng(1))
    model.fit({"t1": masked})
    den = model.denoised()["t1"]
    assert tsutils.rmse(den, mean) < 0.2
    # imputation error specifically at the masked positions
    assert tsutils.rmse_at_mask(np.isnan(masked), mean, den) < 0.25


def test_rolling_one_step_forecast():
    n_test = 200
    obs, mean = mixture_series(T + n_test, seed=42)
    model = SVDModel("t1", K, N, M).fit({"t1": obs[:T]})
    preds = np.array([
        model.predict({}, {"t1": obs[i - N + 1: i]})
        for i in range(T, T + n_test)
    ])
    rmse_mean = tsutils.rmse(preds, mean[T: T + n_test])
    # forecast tracks the mean better than predicting the last value would
    naive = tsutils.rmse(obs[T - 1: T + n_test - 1], mean[T: T + n_test])
    assert rmse_mean < naive
    assert rmse_mean < 0.25


def test_tsmodel_ensemble_incremental():
    L, T0, gamma, k, rect = 20, 400, 0.5, 3, 5
    n = 30_000
    obs, mean = mixture_series(n, seed=7)
    ens = TSModelEnsemble(k, L, gamma, T0, rect_factor=rect)
    # feed in uneven chunks to exercise incremental folding-in + refits
    pos = 0
    rng = np.random.default_rng(3)
    while pos < n - 1000:
        step = int(rng.integers(300, 2500))
        ens.update_model(obs[pos: pos + step])
        pos += step
    assert ens.m_update_index > 0.8 * pos
    den = ens.denoise_ts()
    assert not np.isnan(den).any()
    assert tsutils.rmse(den, mean[: den.size]) < tsutils.rmse(
        obs[: den.size], mean[: den.size])
    # at least one sub-model was re-fitted and at least one folded-in
    assert sum(s.times_reconstructed for s in ens.models) >= len(ens.models)
    assert any(s.times_updated > 0 for s in ens.models)
    # rolling forecasts over the tail
    preds = [ens.predict(obs[i - L + 1: i], no_models=10)
             for i in range(pos, pos + 200)]
    assert tsutils.rmse(np.array(preds), mean[pos: pos + 200]) < 0.35


def test_tsmodel_matches_batch_feed():
    """Incremental chunked feeding == one-shot feeding (order determinism)."""
    n = 12_000
    obs, _ = mixture_series(n, seed=11)
    a = TSModelEnsemble(3, 20, 0.5, 400, rect_factor=5)
    b = TSModelEnsemble(3, 20, 0.5, 400, rect_factor=5)
    a.update_model(obs)
    pos = 0
    for step in (1000, 3000, 2500, 4000, 1500):
        b.update_model(obs[pos: pos + step])
        pos += step
    assert a.m_update_index == b.m_update_index
    # same coverage; values may differ where b used folding-in vs full fit
    da, db = a.denoise_ts(), b.denoise_ts()
    assert da.size == db.size
    assert tsutils.rmse(da, db) < 0.1
