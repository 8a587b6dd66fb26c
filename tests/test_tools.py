"""Tests for auxiliary tools: slicqfinder oracle search, visualization,
evaluation CLI plumbing."""

import numpy as np
import pytest

from xumx_slicq_tpu import data as D
from xumx_slicq_tpu.slicqfinder import evaluate_config, oracle_separate, slicqfinder_main


def test_oracle_separation_beats_naive():
    """Oracle Wiener masks with ground-truth magnitudes should separate the
    synthetic stems far better than using the mix itself as each estimate."""
    import jax.numpy as jnp

    from xumx_slicq_tpu.ops.bsseval import fast_sdr
    from xumx_slicq_tpu.ops.slicqt import SliCQT

    ds = D.SyntheticDataset(n_tracks=1, seq_duration=1.0, samples_per_track=1, seed=0)
    seg = ds[0]
    t = SliCQT(scale="mel", fbins=32, fmin=100.0)
    est = np.asarray(oracle_separate(t, jnp.asarray(seg[0]), jnp.asarray(seg[1:])))
    oracle_sdrs = [fast_sdr(est[i], seg[1 + i]) for i in range(4)]
    naive_sdrs = [fast_sdr(seg[0], seg[1 + i]) for i in range(4)]
    assert np.mean(oracle_sdrs) > np.mean(naive_sdrs) + 5.0


def test_evaluate_config_guards():
    segments = [D.SyntheticDataset(n_tracks=1, seq_duration=0.5, samples_per_track=1)[0]]
    # sllen too large -> rejected
    big = evaluate_config({"fscale": "bark", "fbins": 262, "fmin": 5.0}, segments)
    assert big is None or isinstance(big, float)
    ok = evaluate_config({"fscale": "mel", "fbins": 16, "fmin": 300.0}, segments)
    assert ok is not None and np.isfinite(ok)


def test_slicqfinder_main_smoke(tmp_path):
    out = tmp_path / "res.json"
    best = slicqfinder_main([
        "--synthetic-dataset", "--n-iter", "3", "--n-segments", "1",
        "--seq-dur", "0.5", "--output-json", str(out), "--seed", "1",
    ])
    assert best is None or "oracle_sdr" in best
    assert out.exists()


def test_slicqfinder_per_target(tmp_path):
    """--per-target emits 4 per-stem oracle SDRs per config and tracks a best
    config per target (reference slicqfinder.py:357-411 single-target mode)."""
    import json as J

    out = tmp_path / "res.json"
    res = slicqfinder_main([
        "--synthetic-dataset", "--n-iter", "3", "--n-segments", "1",
        "--seq-dur", "0.5", "--output-json", str(out), "--seed", "1",
        "--per-target",
    ])
    assert res is not None and "best_per_target" in res
    bpt = res["best_per_target"]
    assert set(bpt.keys()) == {"bass", "vocals", "other", "drums"}
    for t, entry in bpt.items():
        if entry is not None:
            assert np.isfinite(entry["oracle_sdr"])
    saved = J.loads(out.read_text())
    assert "best_per_target" in saved
    for h in saved["history"]:
        assert set(h["per_target"].keys()) == {"bass", "vocals", "other", "drums"}


def test_visualization(tmp_path):
    from xumx_slicq_tpu.visualization import visualization_main

    rng = np.random.default_rng(0)
    wav = tmp_path / "sig.wav"
    D.save_audio(wav, (rng.standard_normal((2, 22050)) * 0.2).astype(np.float32), 44100)
    outdir = tmp_path / "plots"
    visualization_main([
        "--input-wav", str(wav), "--output-dir", str(outdir),
        "--fscale", "mel", "--fbins", "16", "--fmin", "300.0",
    ])
    pngs = list(outdir.glob("*.png"))
    assert len(pngs) > 3


def test_overlap_add_slicq_matches_loop():
    from xumx_slicq_tpu.visualization import overlap_add_slicq

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 5, 8)).astype(np.float32)
    out = overlap_add_slicq(x)
    # reference loop semantics (visualization.py:13-35)
    C, F, S, M = x.shape
    hop = M // 2
    expect = np.zeros((C, F, S * hop + hop), np.float32)
    ptr = 0
    for i in range(S):
        expect[:, :, ptr: ptr + M] += x[:, :, i, :]
        ptr += hop
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_evaluation_plumbing(tmp_path):
    """evaluation CLI over a fabricated 2-track musdb tree with a tiny model."""
    import json as J

    import jax

    from xumx_slicq_tpu.evaluation import evaluation_main, merge_results
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.separator import save_model_weights

    rng = np.random.default_rng(0)
    for name in ["songA", "songB"]:
        d = tmp_path / "musdb" / "test" / name
        d.mkdir(parents=True)
        stems = {s: (rng.standard_normal((2, 30000)) * 0.2).astype(np.float32) for s in D.SOURCES}
        D.save_audio(d / "mixture.wav", sum(stems.values()), 44100)
        for s, a in stems.items():
            D.save_audio(d / f"{s}.wav", a, 44100)

    md = tmp_path / "model"
    md.mkdir()
    args = dict(fscale="mel", fbins=12, fmin=200.0, sample_rate=44100.0, seq_dur=0.3,
                nb_channels=2, realtime=False, lstm=False)
    (md / "xumx_slicq_tpu.json").write_text(J.dumps({"args": args}))
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    m = Unmix(t.block_shapes(1, 2, int(0.3 * 44100)))
    params, stats = m.init(jax.random.PRNGKey(0))
    save_model_weights(md, params, stats)

    out_json = tmp_path / "scores.json"
    results = evaluation_main([
        "--musdb-root", str(tmp_path / "musdb"), "--model-path", str(md),
        "--runtime-backend", "jax-cpu", "--output-json", str(out_json),
        "--chunk-size", "40000",
    ])
    agg = results.agg_frames_tracks_scores()
    assert set(agg.keys()) == {"bass", "vocals", "other", "drums"}
    assert np.isfinite(results.total_sdr())

    merged = merge_results([out_json])
    assert len(merged.tracks) == 2


def test_demixui_live_gain_mutation():
    """stream_demix re-reads the mutable gains each chunk, so a keypress
    between chunks changes the mix from the next chunk on; apply_key maps
    b/B v/V o/O d/D to the stem order and clips to [0, 2]."""
    from xumx_slicq_tpu.demixui import STEMS, apply_key, stream_demix

    class FakeSeparator:
        sample_rate = 100

        def __call__(self, seg):
            # stem k separates to constant k+1 over the chunk
            n = seg.shape[-1]
            return np.arange(1, 5, dtype=np.float32)[:, None, None, None] * np.ones(
                (4, 1, 1, n), np.float32)

    audio = np.zeros((1, 1, 300), np.float32)
    gains = [1.0, 1.0, 1.0, 1.0]
    chunks = []
    for remix, levels in stream_demix(FakeSeparator(), audio, gains, chunk_seconds=1.0):
        chunks.append(float(remix[0, 0, 0]))
        assert apply_key("v", gains)  # vocals (index 1) down 0.1 per chunk
    assert chunks[0] == pytest.approx(1 + 2 + 3 + 4)
    assert chunks[1] == pytest.approx(1 + 2 * 0.9 + 3 + 4)
    assert chunks[2] == pytest.approx(1 + 2 * 0.8 + 3 + 4)

    assert list(STEMS) == ["bass", "vocals", "other", "drums"]
    g = [0.0, 2.0, 1.0, 1.0]
    apply_key("b", g)   # clipped at 0
    apply_key("V", g)   # clipped at 2
    assert g[:2] == [0.0, 2.0]
    assert not apply_key("q", g)
