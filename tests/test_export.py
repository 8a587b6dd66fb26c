"""Export tests: StableHLO round-trip through jax.export artifacts."""

import json

import numpy as np
import pytest

import jax

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.separator import Separator, save_model_weights
from xumx_slicq_tpu.export import ExportedSeparator, export_model

TINY_ARGS = dict(
    fscale="mel", fbins=12, fmin=200.0, sample_rate=44100.0, seq_dur=0.3,
    nb_channels=2, realtime=False, lstm=False,
)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_model_export")
    (d / "xumx_slicq_tpu.json").write_text(json.dumps({"args": TINY_ARGS}))
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    shapes = t.block_shapes(1, 2, int(0.3 * 44100))
    m = Unmix(shapes)
    params, stats = m.init(jax.random.PRNGKey(0))
    save_model_weights(d, params, stats)
    return d


def test_export_and_run(tiny_model_dir, tmp_path):
    out = tmp_path / "exported"
    meta = export_model(tiny_model_dir, out, chunk_lens=(16384,))
    assert (out / "manifest.json").exists()
    assert (out / "chunk_16384.stablehlo").exists()
    assert meta["chunks"][0]["bytes"] > 1000

    exp = ExportedSeparator(out)
    x = np.random.default_rng(0).standard_normal((1, 2, 20000)).astype(np.float32) * 0.1
    est = exp(x)
    assert est.shape == (4, 1, 2, 20000)
    assert np.isfinite(est).all()

    # parity with the live separator
    sep = Separator.load(model_path=tiny_model_dir, runtime_backend="jax-cpu", chunk_size=16384)
    ref = sep(x)
    np.testing.assert_allclose(est, ref, atol=1e-5)
