"""HAAQI anchoring tests (VERDICT r1 item 9).

clarity.evaluator.haaqi is unavailable offline, so exact parity can't be
checked; instead the re-implementation is anchored against (a) the
published combination model's worked values, (b) monotonicity invariants,
and (c) the reference's published 700-pair CAD1 score distribution
(.github/cadenza-results/scores.csv: per-stem scores ~0.08-0.29, pair
means in [0.152, 0.289], mean 0.205).
"""

import numpy as np
import pytest

from cadenza.haaqi import combination_model, haaqi_v1

CFS = [250, 500, 1000, 2000, 4000, 6000]
NORMAL = [0, 0, 0, 0, 0, 0]
# typical CAD1 listener: moderate sloping loss
MODERATE = [25, 30, 35, 45, 55, 60]

FS = 24000


def _music(seed=0, seconds=3.0, f0=196.0):
    """Synthetic music-like stem: harmonics + amplitude envelope + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 2 * np.pi)) / (k + 1)
              for k in range(6))
    env = 0.5 * (1.0 + np.sin(2 * np.pi * 2.5 * t + rng.uniform(0, 2 * np.pi)))
    return (sig * env + 0.01 * rng.standard_normal(len(t))).astype(np.float64)


def test_combination_model_worked_values():
    """Perfect features give the published near-1 value; zero gives 0."""
    assert combination_model(1.0, 1.0, 1.0, 1.0) == pytest.approx(0.999, abs=1e-9)
    assert combination_model(0.0, 0.0, 0.0, 0.0) == 0.0
    # nonlinear term dominates (0.754 weight on cep_high^3): killing the
    # cepstral correlation must cost far more than killing the linear term
    no_cep = combination_model(0.0, 1.0, 1.0, 1.0)
    no_lin = combination_model(1.0, 1.0, 0.0, 0.0)
    assert no_cep < no_lin


def test_monotonic_under_increasing_noise():
    """Scores must decrease strictly as additive noise grows (for both
    normal and impaired listeners)."""
    sig = _music(0)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(sig))
    sig_rms = np.sqrt(np.mean(sig ** 2))
    for audiogram in (NORMAL, MODERATE):
        scores = []
        for snr_db in (30.0, 10.0, 0.0, -10.0):
            n_rms = sig_rms / 10 ** (snr_db / 20.0)
            proc = sig + noise / np.sqrt(np.mean(noise ** 2)) * n_rms
            scores.append(haaqi_v1(sig, FS, proc, FS, audiogram))
        assert all(0.0 <= s <= 1.0 for s in scores)
        assert all(a > b for a, b in zip(scores, scores[1:])), (audiogram, scores)


def test_separation_like_degradation_in_published_support():
    """A separation-style estimate (stem + bleed from other stems) scored
    under a CAD1-style impaired audiogram must land inside (a loose
    envelope of) the published per-stem score support [~0.08, 0.29] —
    a silent bug in the gammatone/melcor stages would push it to ~0 or ~1."""
    stem = _music(0, f0=196.0)
    bleed = _music(7, f0=277.18) + _music(11, f0=110.0)
    bleed *= np.sqrt(np.mean(stem ** 2)) / np.sqrt(np.mean(bleed ** 2))
    est = 0.8 * stem + 0.45 * bleed  # ~5 dB SDR-ish estimate
    score = haaqi_v1(stem, FS, est, FS, MODERATE)
    assert 0.02 <= score <= 0.65, f"separation-like score {score:.3f} outside plausible support"
    # and a *good* estimate must beat it
    good = haaqi_v1(stem, FS, 0.95 * stem + 0.05 * bleed, FS, MODERATE)
    assert good > score


def test_hearing_loss_does_not_raise_identity_score():
    """Identity under impairment can't beat identity under normal hearing."""
    sig = _music(3)
    s_normal = haaqi_v1(sig, FS, sig, FS, NORMAL)
    s_impaired = haaqi_v1(sig, FS, sig, FS, MODERATE)
    assert s_normal > 0.85
    assert s_impaired <= s_normal + 1e-6
