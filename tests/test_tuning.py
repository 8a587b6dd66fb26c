"""Hyperparameter tuning: pruner semantics + end-to-end smoke with the
reference's SDR-on-validation objective (optuna.py:130-183)."""

import json
from pathlib import Path

import numpy as np
import pytest

from xumx_slicq_tpu.tuning import MedianPruner, tuning_main


def test_objective_reports_only_completed_trials(monkeypatch, tmp_path):
    """Optuna MedianPruner semantics: a PRUNED trial's intermediates must
    not join the pruning history — its values were by definition worse
    than the then-median, so folding them back in would ratchet the median
    up and make pruning progressively laxer."""
    from types import SimpleNamespace

    import xumx_slicq_tpu.training as T
    from xumx_slicq_tpu.tuning import objective

    vals = {}

    def fake_training_main(argv, epoch_callback=None):
        out = []
        for e, v in enumerate(vals["v"], start=1):
            out.append(v)
            if epoch_callback and epoch_callback(e, v, v):
                break
        return None, out

    monkeypatch.setattr(T, "training_main", fake_training_main)
    args = SimpleNamespace(
        study_dir=str(tmp_path), trial_epochs=3, batch_size=1, seq_dur=0.1,
        fscale="mel", fbins=12, fmin=200.0, samples_per_track=1,
        max_valid_samples=1, synthetic_dataset=True, musdb_root="",
        max_batches_per_epoch=-1,
    )
    params = {"hidden_size_1": 8, "hidden_size_2": 8, "time_filter_2": 3}
    pruner = MedianPruner(n_startup_trials=2, n_warmup_steps=0)

    vals["v"] = [1.0, 1.0, 1.0]
    _, pruned, _ = objective(params, args, pruner, 0)
    assert not pruned
    vals["v"] = [2.0, 2.0, 2.0]
    _, pruned, _ = objective(params, args, pruner, 1)
    assert not pruned and len(pruner.history) == 2

    vals["v"] = [9.0, 9.0, 9.0]  # worse than median(1,2) -> pruned at e1
    _, pruned, inter = objective(params, args, pruner, 2)
    assert pruned and 1 in inter
    assert len(pruner.history) == 2  # pruned trial stays OUT of the history


def test_median_pruner():
    p = MedianPruner(n_startup_trials=2, n_warmup_steps=1)
    # warmup epochs never prune
    assert not p.should_prune(0, 100.0)
    # not enough completed trials
    assert not p.should_prune(2, 100.0)
    p.report_trial({1: 1.0, 2: 1.0})
    p.report_trial({1: 3.0, 2: 3.0})
    assert p.should_prune(2, 5.0)      # worse than median(1,3)=2
    assert not p.should_prune(2, 1.5)  # better than median


@pytest.mark.slow
def test_tuning_smoke_sdr_objective(tmp_path, monkeypatch):
    """Two 2-epoch trials on synthetic data; the study must record finite
    SDR objectives (negative SD-SDR through the inverse transform, the
    reference protocol), resume-safe JSON, and — the r2 weak-2 fix — ONE
    model init (= one trace) per trial, not one per epoch."""
    from xumx_slicq_tpu.models import Unmix

    init_calls = [0]
    orig_init = Unmix.init

    def counting_init(self, key):
        init_calls[0] += 1
        return orig_init(self, key)

    monkeypatch.setattr(Unmix, "init", counting_init)

    best = tuning_main([
        "--study-dir", str(tmp_path),
        "--n-trials", "2", "--trial-epochs", "2",
        "--batch-size", "4", "--seq-dur", "0.3",
        "--fscale", "mel", "--fbins", "12", "--fmin", "200.0",
        "--synthetic-dataset", "--max-batches-per-epoch", "2",
    ])
    study = json.loads((tmp_path / "study.json").read_text())
    assert len(study["trials"]) == 2
    vals = [t["value"] for t in study["trials"] if "value" in t]
    assert vals and all(np.isfinite(v) for v in vals)
    assert best is not None and np.isfinite(best["value"])
    assert init_calls[0] == 2, f"{init_calls[0]} model inits for 2 trials"
    # per-epoch prune trajectory recorded for both epochs
    assert set(map(int, study["trials"][0]["intermediate"])) == {1, 2}
    # trial manifests record the SDR validation metric
    m = json.loads((tmp_path / "trial_0" / "xumx_slicq_tpu.json").read_text())
    assert m["args"]["valid_metric"] == "sdr"
    assert m["args"]["mask_sum_coef"] == 0.0
