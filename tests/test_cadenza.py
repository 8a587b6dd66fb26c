"""Cadenza recipe tests: signal processing, HAAQI behavior, end-to-end
enhance + evaluate + merge on a fabricated dataset."""

import json

import numpy as np
import pytest

from cadenza.config import load_config
from cadenza.haaqi import compute_haaqi, haaqi_v1
from cadenza.signal_processing import NALR, Compressor, clip_signal, resample, to_16bit

NORMAL = [0, 0, 0, 0, 0, 0]
MODERATE = [20, 20, 30, 40, 50, 55]
CFS = [250, 500, 1000, 2000, 4000, 6000]


def test_nalr_flat_audiogram_low_gain():
    nalr = NALR(nfir=220, fs=44100)
    fir, delay = nalr.build(np.zeros(6), np.asarray(CFS, float))
    assert len(fir) == 221 and delay == 110
    # near-unity magnitude response for a normal audiogram
    w = np.abs(np.fft.rfft(fir, 4096))
    assert 0.3 < np.median(w) < 3.0


def test_nalr_hearing_loss_boosts_highs():
    nalr = NALR(nfir=220, fs=44100)
    fir, _ = nalr.build(np.asarray(MODERATE, float), np.asarray(CFS, float))
    f = np.fft.rfftfreq(8192, 1 / 44100)
    H = np.abs(np.fft.rfft(fir, 8192))
    low = np.median(H[(f > 200) & (f < 400)])
    high = np.median(H[(f > 3000) & (f < 5000)])
    assert high > low * 2  # high-frequency emphasis for sloping loss


def test_compressor_reduces_loud_passages():
    fs = 16000
    t = np.arange(fs * 2) / fs
    sig = np.sin(2 * np.pi * 440 * t)
    sig[fs:] *= 4.0  # loud second half
    comp = Compressor(fs=fs, threshold=0.35, attenuation=0.1, attack=50, release=1000,
                      rms_buffer_size=0.064)
    out, rms, gains = comp.process(sig)
    assert gains[fs + fs // 2] < 1.0
    assert np.max(np.abs(out[fs:])) < np.max(np.abs(sig[fs:]))
    # attenuation participates: a softer slope (attenuation=0.5) must leave
    # more level through than the near-limiter (attenuation=0.001)
    hard = Compressor(fs=fs, threshold=0.35, attenuation=0.001, attack=50,
                      release=1000, rms_buffer_size=0.064)
    out_hard, _, _ = hard.process(sig)
    soft = Compressor(fs=fs, threshold=0.35, attenuation=0.5, attack=50,
                      release=1000, rms_buffer_size=0.064)
    out_soft, _, _ = soft.process(sig)
    rms_tail = lambda x: np.sqrt(np.mean(x[-fs // 2:] ** 2))
    assert rms_tail(out_hard) < rms_tail(out_soft) < rms_tail(sig)


def test_compressor_gain_scan_matches_naive_loop():
    """The event-driven closed-form smoother must equal the per-sample
    gain-direction recurrence (coef = attack iff target < gain — the
    clarity Compressor rule, where the switch depends on the smoothed
    state itself) to float64 precision, across run/block boundaries and
    for fast (large-coef) attacks."""
    from cadenza.signal_processing import _gain_switched_one_pole

    rng = np.random.default_rng(0)
    n = 2000  # > 3 blocks of 512
    # smoothed-envelope-like target with sharp loud/quiet transitions
    steps = np.repeat(rng.uniform(0.05, 1.2, 10), n // 10)
    kernel = np.ones(101) / 101
    target = np.convolve(steps, kernel, mode="same")
    for a_att, a_rel in [(0.6, 1e-4), (0.99, 0.3), (0.005, 0.001)]:
        got = _gain_switched_one_pole(target, a_att, a_rel)
        g = 1.0
        want = np.empty(n)
        for i in range(n):
            c = a_att if target[i] < g else a_rel
            g = (1.0 - c) * g + c * target[i]
            want[i] = g
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_gain_smoother_hovering_envelope():
    """Worst case for the vectorized smoother: a target oscillating around
    the gain every sample, so every vectorized run dies at length 1. The
    scalar fallback must kick in and stay numerically identical to the
    per-sample recurrence (and transition cleanly back to vectorized runs)."""
    from cadenza.signal_processing import _gain_switched_one_pole

    rng = np.random.default_rng(1)
    n = 4096
    # hover segment: alternate just above/below the running gain (~1.0),
    # then a smooth ramp so both code paths are exercised in one call
    hover = 1.0 + 0.001 * np.where(np.arange(n // 2) % 2 == 0, 1.0, -1.0)
    hover += 1e-4 * rng.standard_normal(n // 2)
    ramp = np.linspace(hover[-1], 0.2, n - n // 2)
    target = np.concatenate([hover, ramp])
    for a_att, a_rel in [(0.5, 0.01), (0.9, 0.9), (0.003, 0.002)]:
        got = _gain_switched_one_pole(target, a_att, a_rel)
        g = 1.0
        want = np.empty(n)
        for i in range(n):
            c = a_att if target[i] < g else a_rel
            g = (1.0 - c) * g + c * target[i]
            want[i] = g
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_compressor_release_while_still_over_threshold():
    """A decaying-but-still-loud passage must recover at RELEASE speed:
    the attack/release switch follows the gain direction, not the
    rms-over-threshold test (which stays true throughout the decay)."""
    fs = 16000
    n = fs  # 1 s
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * 440 * t) * np.concatenate(
        [np.full(n // 2, 4.0), np.linspace(4.0, 1.5, n - n // 2)]
    )
    comp = Compressor(fs=fs, threshold=0.2, attenuation=0.001, attack=5,
                      release=200, rms_buffer_size=0.02)
    out, rms, gains = comp.process(sig)
    decay = slice(n // 2 + fs // 8, n - fs // 8)
    assert np.all(rms[decay] > comp.threshold)  # still compressing
    dg = np.diff(gains[decay])
    assert np.all(dg > -1e-12)  # gain recovering (rising target)
    # release (200 ms) is slow: over ~6000 samples the gain must lag far
    # behind its target — with attack-speed (5 ms) smoothing it would
    # have converged to the target ~instantly
    target = comp.threshold / rms[decay][-1]
    assert gains[decay][-1] < 0.9 * target


def test_clip_and_16bit():
    x = np.array([-2.0, -0.5, 0.5, 2.0])
    hard, n = clip_signal(x, soft_clip=False)
    assert n == 2 and hard.max() == 1.0
    soft, _ = clip_signal(x, soft_clip=True)
    assert np.all(np.abs(soft) < 1.0)
    assert to_16bit(x).dtype == np.int16


def test_haaqi_identity_is_high_and_noise_low():
    rng = np.random.default_rng(0)
    fs = 24000
    t = np.arange(fs * 2) / fs
    # music-like: sum of harmonics with envelope
    sig = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 660, 880]))
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    perfect = haaqi_v1(sig, fs, sig, fs, NORMAL)
    noise = haaqi_v1(sig, fs, rng.standard_normal(len(sig)), fs, NORMAL)
    degraded = haaqi_v1(sig, fs, sig + 0.3 * rng.standard_normal(len(sig)), fs, NORMAL)
    assert perfect > 0.85
    assert degraded < perfect
    assert noise < degraded
    assert 0.0 <= noise <= 1.0


def test_haaqi_wrapper_order():
    fs = 24000
    t = np.arange(fs) / fs
    sig = np.sin(2 * np.pi * 440 * t)
    s = compute_haaqi(sig, sig, fs, fs, MODERATE, CFS)
    assert 0.0 <= s <= 1.0


def test_config_loading(tmp_path):
    cfg = load_config()
    assert cfg.sample_rate == 44100
    assert cfg.nalr.nfir == 220
    assert cfg.path.metadata_dir == "/CADENZA/cad1/task1/metadata"
    y = tmp_path / "override.yaml"
    y.write_text("sample_rate: 22050\nnalr:\n  nfir: 100\n")
    cfg2 = load_config(str(y))
    assert cfg2.sample_rate == 22050 and cfg2.nalr.nfir == 100
    assert cfg2.compressor.threshold == 0.35


@pytest.mark.slow
def test_enhance_evaluate_merge_end_to_end(tmp_path):
    """Full recipe on a fabricated 1-song, 1-listener dataset with a tiny
    separator model."""
    import jax

    from xumx_slicq_tpu import data as D
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.separator import save_model_weights
    from cadenza.enhance import enhance
    from cadenza.evaluate import evaluate
    from cadenza.merge_batches_results import merge

    rng = np.random.default_rng(0)
    # music dir with one song
    song = "Test Song - Demo"
    d = tmp_path / "musdb" / "train" / song
    d.mkdir(parents=True)
    n = 2 * 44100
    t = np.arange(n) / 44100
    stems = {}
    for i, s in enumerate(D.SOURCES):
        f0 = [80, 300, 1000, 2000][i]
        sig = 0.1 * np.stack([np.sin(2 * np.pi * f0 * t), np.sin(2 * np.pi * f0 * 1.01 * t)])
        stems[s] = sig.astype(np.float32)
    D.save_audio(d / "mixture.wav", sum(stems.values()), 44100)
    for s, a in stems.items():
        D.save_audio(d / f"{s}.wav", a, 44100)

    # metadata
    meta = tmp_path / "metadata"
    meta.mkdir()
    (meta / "musdb18.valid.json").write_text(json.dumps([{"Track Name": song, "Split": "train"}]))
    listeners = {
        "L001": {
            "name": "L001",
            "audiogram_cfs": CFS,
            "audiogram_levels_l": MODERATE,
            "audiogram_levels_r": MODERATE,
        }
    }
    (meta / "listeners.valid.json").write_text(json.dumps(listeners))

    # tiny separator model
    md = tmp_path / "model"
    md.mkdir()
    args = dict(fscale="mel", fbins=12, fmin=200.0, sample_rate=44100.0, seq_dur=0.3,
                nb_channels=2, realtime=False, lstm=False)
    (md / "xumx_slicq_tpu.json").write_text(json.dumps({"args": args}))
    tr = SliCQT(scale="mel", fbins=12, fmin=200.0)
    m = Unmix(tr.block_shapes(1, 2, int(0.3 * 44100)))
    params, stats = m.init(jax.random.PRNGKey(0))
    save_model_weights(md, params, stats)

    cfg = load_config(overrides={
        "path": {
            "music_dir": str(tmp_path / "musdb"),
            "metadata_dir": str(meta),
            "music_valid_file": str(meta / "musdb18.valid.json"),
            "listeners_valid_file": str(meta / "listeners.valid.json"),
            "exp_folder": str(tmp_path / "exp"),
        },
        "separator": {"model_path": str(md), "runtime_backend": "jax-cpu"},
    })

    enhance(cfg)
    enhanced = tmp_path / "exp" / "enhanced_signals" / "L001" / song
    stems_written = list(enhanced.glob("*.wav"))
    assert len(stems_written) == 9  # 8 stems + remix
    assert (enhanced / f"L001_{song}_remix.wav").exists()

    evaluate(cfg)
    merged = merge(str(tmp_path / "exp"))
    text = merged.read_text().splitlines()
    assert len(text) == 2  # header + one row
    score = float(text[1].split(",")[2])
    assert 0.0 <= score <= 1.0
