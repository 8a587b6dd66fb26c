"""Training stack tests: jitted step, schedules, checkpoint/resume,
multi-device data parallelism on the virtual CPU mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from xumx_slicq_tpu.training import (
    EarlyStopping,
    ReduceLROnPlateau,
    training_main,
)


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2, cooldown=1)
    for _ in range(3):
        s.step(1.0)  # first sets best, then 2 bad epochs
    assert s.lr == 1.0
    s.step(1.0)  # 3rd bad epoch > patience -> decay
    assert s.lr == 0.5
    # cooldown swallows the next bad epoch
    s.step(1.0)
    assert s.lr == 0.5


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(1.1)
    assert es.step(1.2)
    assert es.step(float("nan"))


@pytest.mark.slow
def test_training_smoke_and_resume(tmp_path):
    """Two epochs on synthetic data, then resume for one more: loss must
    decrease and resume must pick up the history."""
    args = [
        "--synthetic-dataset", "--model-path", str(tmp_path),
        "--fscale", "mel", "--fbins", "12", "--fmin", "200.0",
        "--seq-dur", "0.3", "--batch-size", "4", "--epochs", "2",
        "--debug", "--max-batches-per-epoch", "2", "--quiet",
    ]
    train_losses, valid_losses = training_main(args)
    assert len(train_losses) == 2
    assert np.isfinite(train_losses).all()
    assert train_losses[1] < train_losses[0]
    assert (tmp_path / "xumx_slicq_tpu.chkpnt").exists()
    assert (tmp_path / "params.msgpack").exists()

    with open(tmp_path / "xumx_slicq_tpu.json") as f:
        manifest = json.load(f)
    assert manifest["epochs_trained"] == 2

    args[args.index("--epochs") + 1] = "3"
    train_losses2, _ = training_main(args)
    assert len(train_losses2) == 3
    assert train_losses2[:2] == train_losses


@pytest.mark.slow
def test_training_multidevice(tmp_path):
    """Data-parallel step over all 8 virtual CPU devices."""
    assert jax.device_count() >= 8
    args = [
        "--synthetic-dataset", "--model-path", str(tmp_path),
        "--fscale", "mel", "--fbins", "12", "--fmin", "200.0",
        "--seq-dur", "0.3", "--batch-size", "8", "--epochs", "1",
        "--debug", "--max-batches-per-epoch", "1", "--quiet",
        "--n-devices", "8",
    ]
    train_losses, _ = training_main(args)
    assert np.isfinite(train_losses).all()
