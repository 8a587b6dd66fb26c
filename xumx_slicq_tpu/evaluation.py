"""Evaluation CLI: BSS-eval v4 over the MUSDB18-HQ test set.

Re-design of the reference evaluation (sevagh/xumx-sliCQ-V2
evaluation.py:45-118, museval-based): demix every test track with the
Separator, score SDR/ISR/SIR/SAR with our bsseval engine (ops/bsseval.py),
aggregate median-over-frames / median-over-tracks.

Scaling story (replaces the reference's CSV-shard batch pattern,
cadenza/evaluate.py:254-256): tracks are sharded two ways --
  * `--shard i --num-shards n` splits the track list across independent
    processes/hosts (results merged via merge_results / JSON shards);
  * multiple local devices round-robin tracks, each with its own compiled
    separator executable.
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

from .data import load_audio, preprocess_audio
from .ops.bsseval import EvalStore, TrackScores, eval_track
from .separator import Separator

STEMS = ["mixture", "bass", "vocals", "other", "drums"]


def list_tracks(musdb_root: str, subset: str):
    base = Path(musdb_root) / subset
    if not base.exists():
        raise FileNotFoundError(f"no {subset} subset at {base}")
    return sorted(d for d in base.iterdir() if (d / "mixture.wav").exists())


def separate_and_evaluate(separator: Separator, track_dir: Path, use_jax: bool = False) -> TrackScores:
    audio, rate = load_audio(track_dir / "mixture.wav")
    audio = preprocess_audio(audio, rate, separator.sample_rate)

    estimates = separator(audio)
    est_dict = separator.to_dict(estimates)
    est_np = {k: np.asarray(v)[0].T for k, v in est_dict.items()}  # (nsampl, nchan)

    refs = {}
    for t in separator.sources:
        a, _ = load_audio(track_dir / f"{t}.wav")
        refs[t] = a.T
    return eval_track(refs, est_np, track_name=track_dir.name, use_jax=use_jax)


def track_scores_to_json(ts: TrackScores) -> dict:
    return {
        "name": ts.name,
        "targets": {t: {m: list(map(float, v)) for m, v in ms.items()} for t, ms in ts.targets.items()},
    }


def track_scores_from_json(d: dict) -> TrackScores:
    return TrackScores(
        name=d["name"],
        targets={t: {m: np.asarray(v) for m, v in ms.items()} for t, ms in d["targets"].items()},
    )


def merge_results(shard_files) -> EvalStore:
    """Merge per-shard JSON results (replaces cadenza
    merge_batches_results.py)."""
    store = EvalStore()
    for f in shard_files:
        with open(f) as fh:
            for d in json.load(fh):
                store.add_track(track_scores_from_json(d))
    return store


def evaluation_main(argv=None):
    parser = argparse.ArgumentParser(description="MUSDB18 Evaluation (BSS-eval v4)")
    parser.add_argument("--track", type=str, default=None)
    parser.add_argument("--realtime", action="store_true", default=False)
    parser.add_argument("--model-path", type=str, default=None)
    parser.add_argument("--musdb-root", type=str, default="/MUSDB18-HQ")
    parser.add_argument("--subset", type=str, default="test")
    parser.add_argument("--chunk-size", type=int, default=2621440)
    parser.add_argument("--runtime-backend", default="jax-auto",
                        choices=("jax-auto", "jax-tpu", "jax-cpu"))
    parser.add_argument("--shard", type=int, default=0)
    parser.add_argument("--num-shards", type=int, default=1)
    parser.add_argument("--devices", type=int, default=1,
                        help="round-robin tracks over this many local devices")
    parser.add_argument("--output-json", type=str, default=None,
                        help="write per-track scores JSON (shard merging)")
    parser.add_argument("--bss-on-device", action="store_true", default=False,
                        help="run the BSS-eval FFTs/solves via JAX")
    args = parser.parse_args(argv)

    tracks = list_tracks(args.musdb_root, args.subset)
    if args.track is not None:
        tracks = [t for t in tracks if t.name == args.track]
    tracks = tracks[args.shard:: args.num_shards]
    if not tracks:
        raise ValueError("dataset is empty")

    # one separator per local device; tracks round-robin across them
    # (the multi-chip eval fan-out replacing the reference's CSV-shard
    # pattern; combine with --shard/--num-shards for multi-host)
    import jax as _jax

    n_dev = max(1, min(args.devices, len(_jax.devices())))
    separators = []
    for di in range(n_dev):
        sep = Separator.load(
            chunk_size=args.chunk_size,
            runtime_backend=args.runtime_backend,
            realtime=args.realtime,
            model_path=args.model_path,
        )
        if n_dev > 1:
            dev = _jax.devices()[di]
            sep.device = dev
            sep.params = _jax.device_put(sep.params, dev)
            sep.batch_stats = _jax.device_put(sep.batch_stats, dev)
            sep._chunk_fns = {}
        separators.append(sep)

    results = EvalStore()
    shard_json = []
    for ti, td in enumerate(tracks):
        t0 = time.time()
        ts = separate_and_evaluate(separators[ti % n_dev], td, use_jax=args.bss_on_device)
        print(f"{ts}  [{time.time()-t0:.1f}s]")
        results.add_track(ts)
        shard_json.append(track_scores_to_json(ts))
        if args.output_json:
            with open(args.output_json, "w") as f:
                json.dump(shard_json, f)

    print(results)
    return results


if __name__ == "__main__":
    evaluation_main()
