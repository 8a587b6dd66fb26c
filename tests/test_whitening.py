"""Whitening-statistics golden test (VERDICT r1 item 8).

Our `get_statistics` processes fixed-size windows (one compiled transform
shape); the reference transforms each FULL variable-length track and feeds
(frames, F) rows of the channel-mean magnitude into a per-block
StandardScaler (reference training.py:115-154). These tests quantify the
window-boundary deviation against the reference protocol executed with the
torch reference transform on identical data:

  * window == track length: the protocols coincide (same signal, one
    transform call) -> tight tolerance, fp32 torch-vs-jax only.
  * windowed (2 windows/track + a non-commensurate length with a final
    overlapped window): bounded relative deviation.
"""

import numpy as np
import pytest

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.training import get_statistics

from conftest import reference_available, import_reference

TINY = dict(scale="mel", fbins=12, fmin=200.0)
SR = 44100


class FixedTrackDataset:
    """Minimal dataset: deterministic full tracks (mixture only is used)."""

    sample_rate = float(SR)
    samples_per_track = 1

    def __init__(self, tracks):
        self.tracks = tracks

    def __len__(self):
        return len(self.tracks)

    def __getitem__(self, i):
        return self.tracks[i], None


def _make_tracks(lengths, seed=0):
    rng = np.random.default_rng(seed)
    # shaped noise so the stats are non-trivial per frequency
    return [
        (rng.standard_normal((2, L)) * np.linspace(0.2, 1.0, L)).astype(np.float32)
        for L in lengths
    ]


def _reference_statistics(tracks):
    """The reference protocol: full-track transform, channel-mean magnitude,
    per-block population mean/std over (frames, F) rows, std clamped at
    1e-4 * max (training.py:115-154; StandardScaler is population ddof=0)."""
    import torch

    import_reference()
    from xumx_slicq_v2 import transforms

    base = transforms.NSGTBase(TINY["scale"], TINY["fbins"], TINY["fmin"],
                               fs=float(SR), device="cpu")
    nsgt, _ = transforms.make_filterbanks(base, sample_rate=float(SR))
    cnorm = transforms.ComplexNorm()

    s1 = s2 = None
    count = None
    with torch.no_grad():
        for x in tracks:
            X = cnorm(nsgt(torch.from_numpy(x)[None]))
            rows = [
                torch.flatten(Xb, start_dim=-2, end_dim=-1)
                .mean(1)
                .permute(0, 2, 1)
                .squeeze(0)
                .numpy()
                for Xb in X
            ]
            if s1 is None:
                n = len(rows)
                s1 = [r.sum(0) for r in rows]
                s2 = [(r ** 2).sum(0) for r in rows]
                count = [r.shape[0] for r in rows]
            else:
                for i, r in enumerate(rows):
                    s1[i] += r.sum(0)
                    s2[i] += (r ** 2).sum(0)
                    count[i] += r.shape[0]
    means = [s1[i] / count[i] for i in range(len(s1))]
    stds = []
    for i in range(len(s1)):
        var = np.maximum(s2[i] / count[i] - means[i] ** 2, 0.0)
        std = np.sqrt(var)
        stds.append(np.maximum(std, 1e-4 * np.max(std)))
    return means, stds


def _max_rel_dev(ours, ref):
    dev = 0.0
    for a, b in zip(ours, ref):
        a, b = np.asarray(a), np.asarray(b)
        dev = max(dev, float(np.max(np.abs(a - b) / (np.abs(b) + 1e-12))))
    return dev


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not available")
def test_whitening_golden_window_equals_track():
    """With window == track length the two protocols see identical signals:
    only torch-vs-jax fp32 transform numerics remain."""
    L = 2 * SR
    tracks = _make_tracks([L, L, L])
    slicqt = SliCQT(**TINY)
    means, stds = get_statistics(slicqt, FixedTrackDataset(tracks), window_s=2.0)
    ref_means, ref_stds = _reference_statistics(tracks)
    assert _max_rel_dev(means, ref_means) < 1e-3
    assert _max_rel_dev(stds, ref_stds) < 1e-3


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not available")
def test_whitening_windowed_deviation_bounded():
    """Windowed accumulation vs the reference's full-track protocol: the
    deviation comes from per-window slice-grid padding and the overlapped
    final window; it must stay a small relative error."""
    tracks = _make_tracks([4 * SR, 4 * SR, int(3.3 * SR)], seed=1)
    slicqt = SliCQT(**TINY)
    means, stds = get_statistics(slicqt, FixedTrackDataset(tracks), window_s=2.0)
    ref_means, ref_stds = _reference_statistics(tracks)
    mdev = _max_rel_dev(means, ref_means)
    sdev = _max_rel_dev(stds, ref_stds)
    print(f"windowed whitening deviation: means {mdev:.4f} stds {sdev:.4f}")
    assert mdev < 0.10, f"mean deviation {mdev:.4f} exceeds 10%"
    assert sdev < 0.10, f"std deviation {sdev:.4f} exceeds 10%"


def test_whitening_neutralizes_training_sampler(tmp_path):
    """get_statistics must compute from deterministic full-track on-disk
    mixtures even when handed the TRAINING dataset (random 2 s crops,
    gain/channelswap augmentations, random track mixing) — the reference
    neutralizes the dataset the same way (training.py:124-132). Identical
    inputs -> bit-identical statistics vs the explicit full-track protocol."""
    from xumx_slicq_tpu import data as D

    rng = np.random.default_rng(3)
    n = int(0.8 * SR)
    mixes = []
    for name in ["trackA", "trackB"]:
        d = tmp_path / "train" / name
        d.mkdir(parents=True)
        stems = {s: (rng.standard_normal((2, n)) * 0.2).astype(np.float32)
                 for s in D.SOURCES}
        mix = sum(stems.values())
        D.save_audio(d / "mixture.wav", mix, SR)
        for s, a in stems.items():
            D.save_audio(d / f"{s}.wav", a, SR)
        mixes.append(mix)

    train_ds = D.TrackTreeDataset(
        tmp_path, split="train", seq_duration=0.25, samples_per_track=4,
        random_track_mix=True,
        source_augmentations=D.aug_from_str(["gain", "channelswap"]),
    )
    slicqt = SliCQT(**TINY)
    means, stds = get_statistics(slicqt, train_ds, window_s=0.8)
    # the same full tracks via the explicit fixed protocol; load from disk
    # so any wav round-trip quantization cancels
    loaded = [D.load_audio(tmp_path / "train" / t / "mixture.wav")[0]
              for t in ["trackA", "trackB"]]
    ref_means, ref_stds = get_statistics(
        slicqt, FixedTrackDataset(loaded), window_s=0.8
    )
    for a, b in zip(means, ref_means):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    for a, b in zip(stds, ref_stds):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_whitening_short_track_padding_trimmed():
    """A track shorter than the stats window is zero-padded to the single
    compiled shape; the pure-padding slices must be dropped from the
    accumulation (without the trim, a 4x pad drags the mean ~4x low)."""
    L = SR  # 1 s track
    tracks = _make_tracks([L], seed=2)
    slicqt = SliCQT(**TINY)
    exact_m, exact_s = get_statistics(
        slicqt, FixedTrackDataset(tracks), window_s=1.0
    )  # window == track: the exact protocol
    padded_m, padded_s = get_statistics(
        slicqt, FixedTrackDataset(tracks), window_s=4.0
    )  # 4x zero-padding, trimmed
    mdev = _max_rel_dev(padded_m, exact_m)
    sdev = _max_rel_dev(padded_s, exact_s)
    print(f"short-track trim deviation: means {mdev:.4f} stds {sdev:.4f}")
    assert mdev < 0.25, f"mean deviation {mdev:.4f}: padding not trimmed?"
    assert sdev < 0.25, f"std deviation {sdev:.4f}: padding not trimmed?"
