"""Kernel parity tests (SURVEY.md §5.2.1): the checkable invariants of the
reference's core math, as real asserts. No Ray needed here."""

import numpy as np
import pytest

from tslib_ray.kernels import tsutils
from tslib_ray.kernels.als import ALSWrapper
from tslib_ray.kernels.svd import SVDWrapper
from tslib_ray.kernels.tsmodel import ALSModel, SVDModel


RNG = np.random.default_rng(42)


def test_fold_unfold_roundtrip():
    arr = RNG.normal(size=20)
    m = tsutils.array_to_matrix(arr, 4, 5)
    # column j holds points [j*N, (j+1)*N)  (src/tsUtils.py:59-67)
    np.testing.assert_array_equal(m[:, 1], arr[4:8])
    np.testing.assert_array_equal(tsutils.matrix_to_array(m), arr)


def test_fold_requires_exact_size():
    with pytest.raises(ValueError):
        tsutils.array_to_matrix(np.zeros(7), 2, 3)


def test_pinverse_from_svd_matches_numpy():
    # the reference's own commented micro-test (src/tsUtils.py:218-220)
    M = RNG.normal(size=(6, 4))
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    got = tsutils.pinverse_from_svd(s, U, Vt.T)
    np.testing.assert_allclose(got, np.linalg.pinv(M), atol=1e-10)


def test_matrix_from_svd_reconstructs():
    M = RNG.normal(size=(5, 7))
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    np.testing.assert_allclose(tsutils.matrix_from_svd(s, U, Vt.T), M,
                               atol=1e-10)
    # probability rescale: 1/p factor (src/tsUtils.py:70-71)
    np.testing.assert_allclose(tsutils.matrix_from_svd(s, U, Vt.T, 0.5),
                               2.0 * M, atol=1e-10)


def test_rank_k_error_monotone():
    M = RNG.normal(size=(10, 20))
    w = SVDWrapper(M)
    errs = [np.linalg.norm(M - w.reconstruct(k, return_matrix=True))
            for k in (1, 3, 5, 10)]
    assert errs == sorted(errs, reverse=True)
    np.testing.assert_allclose(w.reconstruct(10, return_matrix=True), M,
                               atol=1e-8)


def test_topk_clamping():
    w = SVDWrapper(RNG.normal(size=(3, 5)))
    sk, Uk, Vk = w.decompose_top_k(0)
    assert len(sk) == 0
    sk, Uk, Vk = w.decompose_top_k(99)  # clamps to min(N, M)=3
    assert len(sk) == 3 and Uk.shape == (3, 3) and Vk.shape == (5, 3)


def test_folding_in_extends_v_only():
    M = RNG.normal(size=(6, 8))
    w = SVDWrapper(M)
    sk, Uk, Vk = w.reconstruct(3)
    D = RNG.normal(size=(6, 2))
    u2, s2, v2 = tsutils.update_svd_folding_in(D, Uk, sk, Vk)
    assert u2 is Uk and s2 is sk
    assert v2.shape == (10, 3)
    np.testing.assert_array_equal(v2[:8], Vk)


def test_update_svd_up_exact_for_full_rank():
    # appending columns to an exactly rank-k matrix must reproduce the
    # enlarged matrix exactly (src/tsUtils.py:24-57 semantics)
    k = 3
    A = RNG.normal(size=(8, k)) @ RNG.normal(size=(k, 6))
    D = A[:, :2] @ np.eye(2)  # new columns inside the same column space
    U, s, Vt = np.linalg.svd(A, full_matrices=False)
    u2, s2, v2 = tsutils.update_svd_up(D, U[:, :k], s[:k], Vt.T[:, :k])
    recon = tsutils.matrix_from_svd(s2, u2, v2)
    np.testing.assert_allclose(recon, np.hstack([A, D]), atol=1e-8)


def test_normalize_roundtrip():
    arr = RNG.uniform(-5, 17, size=100)
    norm = tsutils.normalize(arr, arr.max(), arr.min())
    assert norm.min() >= -1 - 1e-12 and norm.max() <= 1 + 1e-12
    np.testing.assert_allclose(
        tsutils.unnormalize(norm, arr.max(), arr.min()), arr, atol=1e-12)


def test_nan_interpolate():
    arr = np.array([1.0, np.nan, 3.0, np.nan, np.nan, 6.0])
    out = tsutils.nan_interpolate(arr)
    np.testing.assert_allclose(out, [1, 2, 3, 4, 5, 6])
    assert np.isnan(arr[1])  # input not mutated


def test_hide_values_deterministic():
    arr = np.ones(1000)
    m1, p1 = tsutils.randomly_hide_values(arr, 0.7, np.random.default_rng(1))
    m2, p2 = tsutils.randomly_hide_values(arr, 0.7, np.random.default_rng(1))
    np.testing.assert_array_equal(np.isnan(m1), np.isnan(m2))
    assert p1 == p2 and 0.6 < p1 < 0.8
    assert not np.isnan(arr).any()


def test_hide_consecutive_runs():
    arr = np.ones(1000)
    masked, p_obs = tsutils.randomly_hide_consecutive(
        arr, 0.9, longest_stretch=25, gap=100, rng=np.random.default_rng(3))
    nans = np.isnan(masked)
    if nans.any():
        # hidden entries come in runs of <= 25
        runs = np.diff(np.flatnonzero(np.diff(np.concatenate(
            [[0], nans.view(np.int8), [0]]))))[::2]
        assert runs.max() <= 25


def test_als_masked_mse_decreases():
    k = 2
    truth = RNG.normal(size=(20, 2)) @ RNG.normal(size=(2, 15))
    masked = truth.copy()
    masked[RNG.random(truth.shape) > 0.7] = np.nan
    als = ALSWrapper(masked, rng=np.random.default_rng(5))
    U, V = als.decompose(k, 0.0, iterations=30, tol=0.0)
    final_err = als.get_error(als.matrix, U, V, als.W)
    assert final_err < 1e-2  # masked entries recovered on low-rank truth


def test_svdmodel_denoise_and_shapes():
    N, M, k = 10, 30, 3
    t = np.arange(N * M, dtype=np.float64)
    base = np.sin(t / 10.0) + 0.1 * RNG.normal(size=N * M)
    model = SVDModel("a", k, N, M).fit({"a": base})
    den = model.denoised()["a"]
    assert den.shape == (N * M,)
    # denoising error bounded
    assert tsutils.rmse(den, np.sin(t / 10.0)) < 0.2
    assert model.weights.shape == (N - 1,)


def test_svdmodel_midrange_fill_and_truncation():
    # series longer than N*M: model uses only the LAST N*M points
    # (tsSVDModel.py:165,170)
    N, M = 4, 5
    extra = np.full(7, 1e6)
    tail = RNG.normal(size=N * M)
    model = SVDModel("a", 4, N, M).fit({"a": np.concatenate([extra, tail])})
    assert abs(model.denoised()["a"]).max() < 1e3  # extras ignored


def test_svdmodel_multiseries_predict():
    # correlated donors -> near-exact one-step forecast on noiseless data
    N, M = 5, 40
    t = np.arange(N * M + 10, dtype=np.float64)
    a = np.sin(t / 7.0)
    model = SVDModel("y", 3, N, M, other_series_keys=["x1", "x2"],
                     include_past_data_only=True)
    model.fit({"y": a[: N * M], "x1": 0.3 * a[: N * M],
               "x2": -0.4 * a[: N * M]})
    i = N * M
    pred = model.predict(
        {"x1": 0.3 * a[i - N + 1 : i], "x2": -0.4 * a[i - N + 1 : i]},
        {"y": a[i - N + 1 : i]})
    assert abs(pred - a[i]) < 0.1


def test_svdmodel_update_folding_in():
    N, M, k = 6, 20, 3
    t = np.arange(N * (M + 2), dtype=np.float64)
    series = np.sin(t / 9.0)
    model = SVDModel("a", k, N, M).fit({"a": series[: N * M]})
    D = series[N * M : N * (M + 1)]
    model.update(D, method="folding-in")
    assert model.M == M + 1
    assert model.Vk.shape == (M + 1, k)
    assert model.last_row_observations.shape == (M + 1,)
    model2 = SVDModel("a", k, N, M).fit({"a": series[: N * M]})
    out = model2.denoised_new(series[N * M : N * (M + 1)], method="UP")
    assert out.shape == (N,)
    np.testing.assert_allclose(out, series[N * M : N * (M + 1)], atol=0.5)


def test_alsmodel_fit_clips_and_fills():
    # exactly rank-1 page structure: x[i] = a[i % N] * b[i // N]
    N, M = 8, 25
    a = 1.0 + RNG.random(N)
    b = 1.0 + RNG.random(M)
    truth = np.outer(a, b).flatten("F")
    masked = truth.copy()
    masked[RNG.random(N * M) > 0.8] = np.nan
    model = ALSModel("a", 1, N, M, rng=np.random.default_rng(9))
    model.fit({"a": masked})
    den = model.denoised()["a"]
    assert den.min() >= np.nanmin(masked) - 1e-9
    assert den.max() <= np.nanmax(masked) + 1e-9
    assert not np.isnan(model.last_row_observations).any()
    assert tsutils.rmse_at_mask(np.isnan(masked), truth, den) < 0.2
