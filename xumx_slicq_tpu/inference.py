"""Inference CLI: batch-demix a directory of wav files into per-stem wavs.

Mirror of the reference CLI surface (sevagh/xumx-sliCQ-V2 inference.py:36-150)
with JAX runtime backends. Reports average per-track wall-clock (the
reference's headline benchmark, README.md:154-160).
"""

import argparse
import os
import time
from pathlib import Path

import numpy as np

from . import data
from .separator import Separator


def separate(audio: np.ndarray, separator: Separator, rate: float = None):
    if rate is None:
        raise ValueError("rate must be provided")
    audio = data.preprocess_audio(audio, rate, separator.sample_rate)
    start = time.time()
    estimates = separator(audio)
    dt = time.time() - start
    return separator.to_dict(estimates), dt


def inference_main(argv=None):
    from .utils import enable_host_malloc_reuse

    enable_host_malloc_reuse()
    parser = argparse.ArgumentParser(description="xumx-sliCQ-TPU Inference")
    parser.add_argument("--input-dir", type=str, default="/input")
    parser.add_argument("--output-dir", type=str, default="/output")
    parser.add_argument("--ext", type=str, default=".wav")
    parser.add_argument("--start", type=float, default=0.0)
    parser.add_argument("--duration", type=float, default=None,
                        help="audio chunk duration in seconds, negative/None = full track")
    parser.add_argument("--runtime-backend", default="jax-auto",
                        choices=("jax-auto", "jax-tpu", "jax-cpu"))
    parser.add_argument("--realtime", action="store_true", default=False)
    parser.add_argument("--warmup-iters", type=int, default=0)
    parser.add_argument("--model-path", type=str, default=None)
    parser.add_argument("--chunk-size", type=int, default=2621440)
    parser.add_argument("--n-devices", type=int, default=0,
                        help="shard each track's chunk batch over this many "
                             "local devices (0 = single device)")
    parser.add_argument("--grouped-wiener", action="store_true", default=False,
                        help="size-class grouped Wiener-EM: ~32%% faster first "
                             "compile for a fresh transform geometry, slower "
                             "steady-state (PERFORMANCE.md round-5 A/B)")
    parser.add_argument("--synth-staging", choices=("f32", "bf16"), default="f32",
                        help="bf16: stage the synthesis assembly through split "
                             "re/im bf16 planes — faster on HBM-bound chips at "
                             "~1.5e-3 relative output error")
    args = parser.parse_args(argv)

    mesh = None
    if args.n_devices and args.n_devices > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices)

    separator = Separator.load(
        chunk_size=args.chunk_size,
        runtime_backend=args.runtime_backend,
        realtime=args.realtime,
        warmup=args.warmup_iters,
        model_path=args.model_path,
        mesh=mesh,
        synth_staging=args.synth_staging,
        grouped_wiener=args.grouped_wiener,
    )

    dur = args.duration if args.duration is not None and args.duration > 0 else None
    tot_time = 0.0
    n_files = 0
    wavs = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".wav"))
    for wav_file in wavs:
        n_files += 1
        audio, rate = data.load_audio(os.path.join(args.input_dir, wav_file),
                                      start=args.start, dur=dur)
        estimates, dt = separate(audio, separator, rate)
        tot_time += dt

        outdir = Path(args.output_dir) / Path(wav_file).stem
        outdir.mkdir(exist_ok=True, parents=True)
        for target, est in estimates.items():
            data.save_audio(outdir / f"{target}{args.ext}", np.squeeze(est, 0), separator.sample_rate)

    if n_files > 0:
        print(f"Inference time in s (averaged across tracks): {tot_time / n_files:.2f}")
    else:
        print(f"No songs were demixed, are you sure {args.input_dir} contains .wav files?")


if __name__ == "__main__":
    inference_main()
