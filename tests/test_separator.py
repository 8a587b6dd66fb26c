"""Separator + inference CLI tests (tiny config)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.separator import Separator, save_model_weights

TINY_ARGS = dict(
    fscale="mel", fbins=12, fmin=200.0, sample_rate=44100.0, seq_dur=0.3,
    nb_channels=2, realtime=False, lstm=False,
)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_model")
    (d / "xumx_slicq_tpu.json").write_text(json.dumps({"args": TINY_ARGS}))
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    shapes = t.block_shapes(1, 2, int(0.3 * 44100))
    m = Unmix(shapes)
    params, stats = m.init(jax.random.PRNGKey(0))
    save_model_weights(d, params, stats)
    return d


def test_separator_load_and_forward(tiny_model_dir):
    sep = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu", chunk_size=20000)
    x = np.random.default_rng(0).standard_normal((1, 2, 33000)).astype(np.float32) * 0.1
    est = sep(x)
    assert est.shape == (4, 1, 2, 33000)
    assert np.isfinite(est).all()
    d = Separator.to_dict(est)
    assert list(d.keys()) == ["bass", "vocals", "other", "drums"]
    agg = Separator.to_dict(est, {"vocals": ["vocals"], "accomp": ["bass", "other", "drums"]})
    np.testing.assert_allclose(
        agg["accomp"], d["bass"] + d["other"] + d["drums"], atol=1e-6
    )


def test_separator_chunking_consistency(tiny_model_dir):
    """Chunked and unchunked demixes agree except near chunk boundaries."""
    sep_small = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu", chunk_size=16384)
    sep_big = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu", chunk_size=10 ** 9)
    x = np.random.default_rng(1).standard_normal((1, 2, 32768)).astype(np.float32) * 0.1
    a = sep_small(x)
    b = sep_big(x)
    assert a.shape == b.shape
    # interior of first chunk should agree closely
    np.testing.assert_allclose(a[..., :8000], b[..., :8000], atol=5e-4)


def test_separator_mesh_sharded(tiny_model_dir):
    """Chunk-sharded multi-chip inference matches single-device output
    (8-device virtual mesh; weights replicated, chunk axis sharded)."""
    from xumx_slicq_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, platform="cpu")
    sep_mesh = Separator.load(model_path=tiny_model_dir, mesh=mesh, chunk_size=16384)
    sep_one = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu", chunk_size=16384)
    x = np.random.default_rng(2).standard_normal((1, 2, 3 * 16384)).astype(np.float32) * 0.1
    a = sep_mesh(x)
    b = sep_one(x)
    assert a.shape == b.shape == (4, 1, 2, 3 * 16384)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_separator_short_input(tiny_model_dir):
    """Inputs shorter than sllen/2+1 are padded (separator.py:162-168)."""
    sep = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu")
    x = np.zeros((1, 2, 100), np.float32)
    est = sep(x)
    assert est.shape == (4, 1, 2, 100)


def test_inference_cli(tiny_model_dir, tmp_path):
    from xumx_slicq_tpu import data as D
    from xumx_slicq_tpu.inference import inference_main

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    rng = np.random.default_rng(2)
    D.save_audio(indir / "song.wav", (rng.standard_normal((2, 22050)) * 0.1).astype(np.float32), 44100)

    inference_main([
        "--input-dir", str(indir), "--output-dir", str(outdir),
        "--model-path", str(tiny_model_dir), "--runtime-backend", "jax-cpu",
    ])
    for stem in ["bass", "vocals", "other", "drums"]:
        p = outdir / "song" / f"{stem}.wav"
        assert p.exists()
        a, sr = D.load_audio(p)
        assert sr == 44100 and a.shape == (2, 22050)
