"""Synthetic RSC/mRSC panel fixtures (FIXTURES.md F4/F5): low-rank
units x time panels where the treated unit is a known convex combination of
donors pre-intervention with a planted post-intervention effect — so the
counterfactual ground truth is known exactly.

Mirrors the generation scheme of
``/root/reference/tests/testScriptMultiSynthControlSVD.py:53-114`` (low-rank
mean matrix + N(0,1)-scaled noise) in seeded, vectorized form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def panel_from_csv(path, unit_col: str, time_col: str, value_col: str,
                   filter_col: str | None = None,
                   filter_value: str | None = None,
                   metric: str = "m0",
                   experiment_id: str = "e0"):
    """CSV -> long panel Dataset ``(experiment_id, unit, metric, t, value)``
    — the reference's ``pd.read_csv`` + row filter + ``pd.pivot_table``
    ingestion (``/root/reference/tests/testScriptSynthControlSVD.py:29-30,
    106-108``) re-expressed streaming: the wide pivot is never materialized;
    RSC's per-experiment group UDF (stages/panel.py) assembles its own small
    matrix, so ingestion stays a stateless vectorized map at any scale."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    ds = rd.read_csv(path)

    def derive(b: pa.Table) -> pa.Table:
        if filter_col is not None:
            b = b.filter(pc.equal(b[filter_col], filter_value))
        n = len(b)
        return pa.table({
            "experiment_id": pa.array([experiment_id] * n),
            "unit": pc.cast(b[unit_col], pa.string()),
            "metric": pa.array([metric] * n),
            "t": pc.cast(b[time_col], pa.int64()),
            "value": pc.cast(b[value_col], pa.float64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def synth_panel(n_donors: int = 16, n_t: int = 40, train_end: int = 30,
                rank: int = 3, effect: float = 1.5, noise_sd: float = 0.05,
                n_metrics: int = 1, n_experiments: int = 1,
                seed: int = 42):
    """Returns ``(panel_df, truth)``: long rows
    (experiment_id, unit, metric, t, value) and per-experiment true
    counterfactual arrays ``truth[(exp, metric)] -> (t_post, cf)``.
    """
    rng = np.random.default_rng(seed)
    frames = []
    truth = {}
    for e in range(n_experiments):
        w_true = rng.dirichlet(np.ones(n_donors))
        for mi in range(n_metrics):
            U = rng.normal(size=(n_donors, rank))
            V = rng.normal(size=(rank, n_t)) + 2.0
            donors = U @ V + noise_sd * rng.normal(size=(n_donors, n_t))
            treated_mean = w_true @ donors
            treated = treated_mean.copy()
            treated[train_end:] += effect  # planted intervention effect
            units = [f"d{j}" for j in range(n_donors)]
            mat = np.vstack([donors, treated])
            for ui, u in enumerate(units + ["treated"]):
                frames.append(pd.DataFrame({
                    "experiment_id": f"e{e}",
                    "unit": u,
                    "metric": f"m{mi}",
                    "t": np.arange(n_t, dtype=np.int32),
                    "value": mat[ui],
                }))
            truth[(f"e{e}", f"m{mi}")] = (
                np.arange(train_end, n_t), treated_mean[train_end:])
    return pd.concat(frames, ignore_index=True), truth
