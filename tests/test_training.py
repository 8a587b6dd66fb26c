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


def test_reduce_lr_on_plateau_matches_torch():
    """Golden vs torch.optim.lr_scheduler.ReduceLROnPlateau: rel threshold
    (epsilon-improvements count as bad epochs) and cooldown decrementing on
    every in-cooldown step, improving epochs included."""
    import torch

    rng = np.random.default_rng(0)
    metrics = (1.0 + 0.01 * rng.standard_normal(200)).tolist()
    # epsilon-"improvement" plateau: each step beats best by 1e-9 (< the
    # 1e-4 rel threshold) — torch still decays here
    metrics[50:90] = [0.9 - 1e-9 * i for i in range(40)]
    # genuine improvements right after a decay (exercises cooldown)
    metrics[90:110] = [0.8 - 0.01 * i for i in range(20)]

    ours = ReduceLROnPlateau(0.001, factor=0.3, patience=5, cooldown=3)
    par = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([par], lr=0.001)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.3, patience=5, cooldown=3
    )
    for m in metrics:
        lr_ours = ours.step(m)
        sch.step(m)
        lr_torch = opt.param_groups[0]["lr"]
        assert abs(lr_ours - lr_torch) < 1e-15, (m, lr_ours, lr_torch)
    assert ours.lr < 0.001  # the trajectory decayed at least once


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(1.1)
    assert es.step(1.2)
    assert es.step(float("nan"))


def test_early_stopping_first_epoch_nan_aborts():
    """A NaN on the FIRST epoch must abort immediately and must not poison
    `best` (the reference's monitor silently adopts NaN as best there,
    training.py:605-611 — deliberate hardening deviation)."""
    es = EarlyStopping(patience=3)
    assert es.step(float("nan"))
    assert es.best is None


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


@pytest.mark.slow
def test_training_hybrid_dp_tp(tmp_path):
    """Hybrid step on a 4x2 dp x tp mesh: batch sharded over dp, the
    4-target weight stack sharded over tp. Loss must match the pure-dp
    run bit-for-bit modulo reduction order (same data, same seed)."""
    assert jax.device_count() >= 8
    base = [
        "--synthetic-dataset",
        "--fscale", "mel", "--fbins", "12", "--fmin", "200.0",
        "--seq-dur", "0.3", "--batch-size", "4", "--epochs", "1",
        "--debug", "--max-batches-per-epoch", "1", "--quiet",
    ]
    tp_losses, _ = training_main(
        base + ["--model-path", str(tmp_path / "tp"), "--n-devices", "8", "--tp", "2"]
    )
    dp_losses, _ = training_main(
        base + ["--model-path", str(tmp_path / "dp"), "--n-devices", "4"]
    )
    assert np.isfinite(tp_losses).all()
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-4)


@pytest.mark.slow
def test_training_bf16_tracks_fp32(tmp_path):
    """bf16 mixed-precision training (--bf16): the synthetic-dataset loss
    trajectory must track the fp32 run within bf16 rounding tolerance, and
    master weights must stay fp32 (reference trains under bf16 autocast,
    training.py:69-70)."""
    from flax import serialization

    base = [
        "--synthetic-dataset",
        "--fscale", "mel", "--fbins", "12", "--fmin", "200.0",
        "--seq-dur", "0.3", "--batch-size", "4", "--epochs", "2",
        "--debug", "--max-batches-per-epoch", "2", "--quiet",
    ]
    bf16_losses, _ = training_main(base + ["--model-path", str(tmp_path / "bf16"), "--bf16"])
    fp32_losses, _ = training_main(base + ["--model-path", str(tmp_path / "fp32")])
    assert np.isfinite(bf16_losses).all()
    assert bf16_losses[1] < bf16_losses[0]
    # trajectories agree to bf16 rounding (operand cast ~3 decimal digits)
    np.testing.assert_allclose(bf16_losses, fp32_losses, rtol=2e-2)

    # master weights stored fp32
    with open(tmp_path / "bf16" / "params.msgpack", "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    leaves = jax.tree.leaves(blob["params"])
    assert all(l.dtype == np.float32 for l in leaves if hasattr(l, "dtype"))

    # the bf16 manifest records the flag so inference/resume can rebuild
    with open(tmp_path / "bf16" / "xumx_slicq_tpu.json") as f:
        manifest = json.load(f)
    assert manifest["args"]["bf16"] is True


def test_target_shardings_rule():
    """Target-stacked leaves shard over tp; whitening vectors and scalars
    stay replicated."""
    from jax.sharding import PartitionSpec as P

    from xumx_slicq_tpu.parallel import make_mesh, target_shardings

    assert jax.device_count() >= 8
    mesh = make_mesh(8, tp=2)
    tree = {
        "enc1_w": np.zeros((4, 50, 2, 1, 8), np.float32),
        "dec2_b": np.zeros((4, 2), np.float32),
        "bn1": {"scale": np.zeros((4, 50), np.float32)},
        "input_mean": np.zeros(4, np.float32),  # 1-D, even with F == 4
        "count": np.zeros((), np.float32),
        # unknown name with a coincidental leading-4 shape must stay
        # replicated (path/name matching, ADVICE r2)
        "future_buf": np.zeros((4, 8), np.float32),
    }
    sh = target_shardings(tree, mesh)
    assert sh["enc1_w"].spec == P("tp")
    assert sh["dec2_b"].spec == P("tp")
    assert sh["bn1"]["scale"].spec == P("tp")
    assert sh["input_mean"].spec == P()
    assert sh["count"].spec == P()
    assert sh["future_buf"].spec == P()
