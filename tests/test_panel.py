"""RSC / mRSC tests: kernel recovery of planted counterfactuals (F4/F5) and
the distributed per-experiment stage."""

import numpy as np
import pytest

import ray.data as rd

from tslib_ray.kernels import tsutils
from tslib_ray.kernels.synthcontrol import (MultiRobustSyntheticControl,
                                            RobustSyntheticControl)
from tslib_ray.sources.panel import synth_panel
from tslib_ray.stages.panel import rsc_counterfactuals


def _series_maps(df, metric, t_lo, t_hi):
    sub = df[(df["metric"] == metric) & (df["t"] >= t_lo) & (df["t"] < t_hi)]
    return {u: g.sort_values("t")["value"].to_numpy()
            for u, g in sub.groupby("unit")}


def test_rsc_recovers_planted_counterfactual():
    panel, truth = synth_panel(seed=1)
    pre = _series_maps(panel, "m0", 0, 30)
    post = _series_maps(panel, "m0", 30, 40)
    donors = [u for u in pre if u != "treated"]
    rsc = RobustSyntheticControl("treated", 4, M=30,
                                 other_series_keys=donors)
    rsc.fit(pre)
    cf = rsc.predict({u: post[u] for u in donors})
    t_post, cf_true = truth[("e0", "m0")]
    # counterfactual tracks the no-effect truth, not the effected actual
    assert tsutils.rmse(cf, cf_true) < 0.2
    effect_est = np.mean(post["treated"] - cf)
    assert abs(effect_est - 1.5) < 0.2
    assert rsc.get_control().shape == (len(donors),)


def test_rsc_als_variant():
    panel, truth = synth_panel(seed=3)
    pre = _series_maps(panel, "m0", 0, 30)
    post = _series_maps(panel, "m0", 30, 40)
    donors = [u for u in pre if u != "treated"]
    rsc = RobustSyntheticControl("treated", 4, M=30, model_type="als",
                                 other_series_keys=donors,
                                 rng=np.random.default_rng(2))
    rsc.fit(pre)
    cf = rsc.predict({u: post[u] for u in donors})
    _, cf_true = truth[("e0", "m0")]
    assert tsutils.rmse(cf, cf_true) < 0.3


def test_mrsc_combines_metrics():
    panel, truth = synth_panel(n_metrics=2, seed=5)
    pre = [_series_maps(panel, m, 0, 30) for m in ("m0", "m1")]
    post = [_series_maps(panel, m, 30, 40) for m in ("m0", "m1")]
    donors = [u for u in pre[0] if u != "treated"]
    mrsc = MultiRobustSyntheticControl(2, [1.0, 1.0], "treated", 4, M=30,
                                       other_series_keys=donors)
    mrsc.fit(pre)
    cfs = mrsc.predict([{u: p[u] for u in donors} for p in post])
    assert len(cfs) == 2 and all(len(c) == 10 for c in cfs)
    for i, m in enumerate(("m0", "m1")):
        _, cf_true = truth[("e0", m)]
        assert tsutils.rmse(cfs[i], cf_true) < 0.3


def test_mrsc_weight_scaling_matches_reference_shape():
    # combineMetrics scales by sqrt(weight) and concatenates along time
    # (multisyntheticControl.py:49-73)
    mrsc = MultiRobustSyntheticControl(2, [4.0, 1.0], "y", 2, M=3,
                                       other_series_keys=["d"])
    combined = mrsc.combine_metrics(
        [{"y": np.ones(3), "d": np.ones(3)},
         {"y": np.full(3, 2.0), "d": np.full(3, 2.0)}], for_training=True)
    np.testing.assert_allclose(combined["y"], [2, 2, 2, 2, 2, 2])
    assert mrsc.combined_M == 6


def test_rsc_stage_many_experiments():
    panel, truth = synth_panel(n_experiments=4, seed=9)
    ds = rd.from_pandas(panel)
    out = rsc_counterfactuals(ds, "treated", 4, train_end=30).to_pandas()
    assert set(out["experiment_id"]) == {f"e{i}" for i in range(4)}
    for e in range(4):
        sub = out[out["experiment_id"] == f"e{e}"].sort_values("t")
        _, cf_true = truth[(f"e{e}", "m0")]
        assert tsutils.rmse(sub["counterfactual"].to_numpy(), cf_true) < 0.3
        assert len(sub) == 10
