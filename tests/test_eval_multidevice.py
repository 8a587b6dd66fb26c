"""Track-sharded evaluation over multiple (virtual CPU) devices."""

import json

import numpy as np
import pytest

import jax

from xumx_slicq_tpu import data as D
from xumx_slicq_tpu.evaluation import evaluation_main
from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.separator import save_model_weights


@pytest.mark.slow
def test_evaluation_round_robin_devices(tmp_path):
    assert jax.device_count() >= 4
    rng = np.random.default_rng(0)
    for name in ["s1", "s2", "s3"]:
        d = tmp_path / "musdb" / "test" / name
        d.mkdir(parents=True)
        stems = {s: (rng.standard_normal((2, 25000)) * 0.2).astype(np.float32) for s in D.SOURCES}
        D.save_audio(d / "mixture.wav", sum(stems.values()), 44100)
        for s, a in stems.items():
            D.save_audio(d / f"{s}.wav", a, 44100)

    md = tmp_path / "model"
    md.mkdir()
    args = dict(fscale="mel", fbins=12, fmin=200.0, sample_rate=44100.0, seq_dur=0.3,
                nb_channels=2, realtime=False, lstm=False)
    (md / "xumx_slicq_tpu.json").write_text(json.dumps({"args": args}))
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    m = Unmix(t.block_shapes(1, 2, int(0.3 * 44100)))
    params, stats = m.init(jax.random.PRNGKey(0))
    save_model_weights(md, params, stats)

    results = evaluation_main([
        "--musdb-root", str(tmp_path / "musdb"), "--model-path", str(md),
        "--runtime-backend", "jax-cpu", "--chunk-size", "30000",
        "--devices", "4",
    ])
    assert len(results.tracks) == 3
    assert np.isfinite(results.total_sdr())
