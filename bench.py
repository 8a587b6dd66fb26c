"""Benchmark: full-song demix wall-clock on one TPU chip, flagship model.

Prints ONE JSON line:
    {"metric": "inference_time_per_track_s", "value": <seconds>,
     "unit": "s", "vs_baseline": <speedup vs reference GPU>}

Baseline: the reference's best per-track inference number, 2.08 s per MUSDB
test track on an RTX 3090-class GPU with the *realtime* model
(BASELINE.md; reference README.md:157). We run the *offline* model
(embedded Wiener-EM -- the 4.4 dB quality level, which the reference demixes
in 23.17 s on CPU) on a 236 s track (the MUSDB test-set average duration).
vs_baseline > 1 means faster than the reference's GPU realtime number.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.separator import Separator

    track_seconds = 236.0  # MUSDB18-HQ test-set average track duration
    sr = 44100

    slicqt = SliCQT()  # canonical bark-262 flagship config
    seq_len = int(2.0 * sr)
    shapes = slicqt.block_shapes(1, 2, seq_len)
    model = Unmix(shapes, realtime=False)  # offline = embedded Wiener-EM
    params, stats = model.init(jax.random.PRNGKey(0))

    dev = jax.devices()[0]
    sep = Separator(slicqt, model, params, stats, device=dev, chunk_size=2621440)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 2, int(track_seconds * sr))).astype(np.float32) * 0.1

    # warmup: compile the chunk executable
    t0 = time.time()
    sep(audio[..., : sep.chunk_size])
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        est = sep(audio)
        times.append(time.time() - t0)
    value = float(min(times))

    baseline = 2.08  # s per track, reference realtime model on RTX 3090 (README.md:157)
    result = {
        "metric": "inference_time_per_track_s",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }
    print(json.dumps(result))
    print(
        f"# device={dev} compile={compile_s:.1f}s runs={[round(t,3) for t in times]} "
        f"track={track_seconds}s model=offline(bark-262, Wiener-EM) "
        f"baseline=2.08s (reference realtime model, RTX 3090)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
