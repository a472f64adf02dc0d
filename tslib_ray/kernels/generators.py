"""Synthetic series generators (the reference's "sources").

Parity targets: ``/root/reference/src/data/generateARMA.py`` (sequential ARMA
recurrence, returns (observed, mean, error)), ``generateHarmonics.py`` (sum of
sines/cosines with period scaled by series length) and ``generateTrend.py``
(power / log / damped-exponential trends). All randomness takes an explicit
seeded Generator. In the engine these run per-series *inside* ``map_batches``
over a seed table (one row per series), never as a driver loop.
"""

from __future__ import annotations

import numpy as np


def generate_arma(ar_lags, ma_lags, starting, time_steps: int,
                  noise_mean: float, noise_sd: float,
                  rng: np.random.Generator):
    """ARMA(p,q): ``x[i] = sum_j ar[j]*x[i-j] + sum_k ma[k]*e[i-k] + e[i]``.

    Parity: ``generateARMA.py:8-38`` — including its quirks: the AR term uses
    lags ``x[i-j]`` for j starting at 0 (so the first AR coefficient multiplies
    the *current, still-zero* entry) and the loop runs to ``timeSteps`` so the
    final ``maxLags`` output entries stay zero; the returned arrays are the
    recurrence buffer sliced at ``[maxLags:]``.
    Returns ``(observed, mean, errors)``.
    """
    ar = np.asarray(ar_lags, dtype=np.float64)
    ma = np.asarray(ma_lags, dtype=np.float64)
    starting = np.asarray(starting, dtype=np.float64)
    p, q = len(ar), len(ma)
    if max(p, q) > len(starting):
        raise ValueError("starting array must be at least max(p, q) long")
    max_lags = max(p, q)
    n = time_steps + max_lags
    out = np.zeros(n)
    out[:max_lags] = starting[:max_lags]
    err = rng.normal(noise_mean, noise_sd, n)
    mean = np.zeros(n)
    for i in range(max_lags, time_steps):
        value = 0.0
        for j in range(p):
            value += out[i - j] * ar[j]
        for k in range(q):
            value += err[i - k] * ma[k]
        out[i] = value + err[i]
        mean[i] = value
    return out[max_lags:], mean[max_lags:], err[max_lags:]


def generate_harmonics(sine_coeffs, sine_periods, cosine_coeffs,
                       cosine_periods, time_steps: int, t_start: int = 0):
    """Sum of harmonics: ``sum_j a_j sin(2 pi f_j t / T) + sum_k b_k cos(...)``.
    Parity: ``generateHarmonics.py:8-28`` (vectorized)."""
    if len(sine_coeffs) != len(sine_periods):
        raise ValueError("sine coeff/period arrays must match")
    if len(cosine_coeffs) != len(cosine_periods):
        raise ValueError("cosine coeff/period arrays must match")
    T = float(time_steps)
    t = np.arange(time_steps, dtype=np.float64)
    out = np.zeros(time_steps)
    for a, f in zip(sine_coeffs, sine_periods):
        out += a * np.sin(t * f * 2.0 * np.pi / T)
    for b, f in zip(cosine_coeffs, cosine_periods):
        out += b * np.cos(t * f * 2.0 * np.pi / T)
    if t_start:
        out[:t_start] = 0.0  # reference loop starts at tStart leaving zeros
    return out


def linear_trend(*, power: float, displacement: float, time_steps: int,
                 t_start: int = 0) -> np.ndarray:
    """``t**power + displacement``. Parity: ``generateTrend.py:9-19``."""
    steps = np.arange(t_start, time_steps, dtype=np.float64)
    return np.power(steps, power) + displacement


def log_trend(*, dampening: float, displacement: float, time_steps: int,
              t_start: int = 0) -> np.ndarray:
    """``log(t) + displacement`` over ``1+t_start..time_steps``.
    Parity: ``generateTrend.py:21-29`` (dampening accepted-but-unused there too)."""
    steps = np.arange(1 + t_start, time_steps + 1, dtype=np.float64)
    return np.log(steps) + displacement


def neg_exp_trend(*, dampening: float, displacement: float,
                  time_steps: int) -> np.ndarray:
    """``exp(-dampening * t) + displacement``. Parity: ``generateTrend.py:31-37``."""
    steps = np.arange(0, -time_steps, -1, dtype=np.float64) * dampening
    return np.exp(steps) + displacement


def generate_trend(fn, **kwargs) -> np.ndarray:
    """Dispatcher. Parity: ``generateTrend.py:40-44``."""
    if fn is None:
        raise ValueError("fn must be a valid vector function")
    return fn(**kwargs)
