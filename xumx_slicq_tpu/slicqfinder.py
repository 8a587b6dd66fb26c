"""sliCQT parameter search: random search over (fscale, fbins, fmin)
maximizing ORACLE separation quality.

Re-design of the reference's slicqfinder (sevagh/xumx-sliCQ-V2
slicqfinder.py:43-453): for each candidate transform config, build
ideal-ratio-mask estimates from the ground-truth stems (magnitude masks fed
through blockwise Wiener-EM, or mix-phase for --phasemix), invert, and score
with the fast energy-ratio SDR (slicqfinder.py:20-40). The transform with
the best oracle SDR bounds what any mask network on it can achieve.

The whole oracle pipeline per config is one jitted XLA program; candidate
configs stream through it.
"""

import argparse
import json
import random
from pathlib import Path
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .data import SyntheticDataset, TrackTreeDataset
from .ops import wiener as W
from .ops.bsseval import fast_sdr
from .ops.slicqt import SliCQT

TARGETS = ["bass", "vocals", "other", "drums"]


def oracle_separate(slicqt: SliCQT, mix: jnp.ndarray, stems: jnp.ndarray, phasemix: bool = False):
    """Ideal-mask separation: stems (4, C, L) ground truth; returns (4, C, L)."""
    L = mix.shape[-1]
    X = slicqt.forward(mix[None])
    Tg = slicqt.forward(stems)
    Y = []
    for Xb, Tb in zip(X, Tg):
        mag = jnp.abs(Tb)[:, None]  # (4, 1, C, F, S, M) ground-truth magnitudes
        if phasemix:
            Yb = W.blockwise_phasemix_sep(Xb, mag)
        else:
            Yb = W.blockwise_wiener(Xb, mag)
        Y.append(Yb.reshape((-1,) + Yb.shape[2:]))
    est = slicqt.backward(Y, L)
    return est  # (4, C, L)


def evaluate_config(
    config: dict,
    segments: List[np.ndarray],
    phasemix: bool = False,
    per_target: bool = False,
):
    """Mean oracle SDR of one transform config over (5, C, L) segments."""
    try:
        slicqt = SliCQT(scale=config["fscale"], fbins=config["fbins"], fmin=config["fmin"],
                        fgamma=config.get("fgamma", 0.0))
    except (AssertionError, ValueError) as e:
        return None
    if slicqt.sllen > 44100:  # same guard as the reference tuner (optuna.py sllen cap)
        return None

    fn = jax.jit(lambda m, s: oracle_separate(slicqt, m, s, phasemix))
    scores = []
    for seg in segments:
        mix = jnp.asarray(seg[0])
        stems = jnp.asarray(seg[1:])
        est = np.asarray(fn(mix, stems))
        if per_target:
            scores.append([fast_sdr(est[i], seg[1 + i]) for i in range(4)])
        else:
            scores.append(np.mean([fast_sdr(est[i], seg[1 + i]) for i in range(4)]))
    return float(np.mean(scores)) if not per_target else np.mean(scores, axis=0)


def random_config(rng: random.Random) -> dict:
    fscale = rng.choice(["bark", "mel", "cqlog", "vqlog"])
    cfg = {
        "fscale": fscale,
        "fbins": rng.randint(10, 300),
        "fmin": rng.uniform(10.0, 130.0),
    }
    if fscale == "vqlog":
        cfg["fgamma"] = rng.uniform(1.0, 50.0)
    return cfg


def slicqfinder_main(argv=None):
    parser = argparse.ArgumentParser(description="sliCQT oracle param search")
    parser.add_argument("--musdb-root", type=str, default="/MUSDB18-HQ")
    parser.add_argument("--synthetic-dataset", action="store_true", default=False)
    parser.add_argument("--n-iter", type=int, default=100)
    parser.add_argument("--n-segments", type=int, default=4)
    parser.add_argument("--seq-dur", type=float, default=5.0)
    parser.add_argument("--phasemix", action="store_true", default=False,
                        help="oracle with mix-phase instead of Wiener-EM")
    parser.add_argument("--per-target", action="store_true", default=False,
                        help="optimize each stem independently: report 4 per-stem "
                        "oracle SDRs per config and track a best config per target "
                        "(reference slicqfinder.py:357-411 single-target mode)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-json", type=str, default=None)
    args = parser.parse_args(argv)

    rng = random.Random(args.seed)
    if args.synthetic_dataset:
        ds = SyntheticDataset(n_tracks=args.n_segments, seq_duration=args.seq_dur, samples_per_track=1, seed=args.seed)
    else:
        ds = TrackTreeDataset(args.musdb_root, split="train", seq_duration=args.seq_dur,
                              samples_per_track=1, seed=args.seed)
    segments = [ds[i] for i in range(min(args.n_segments, len(ds)))]

    best = None
    best_per_target = {t: None for t in TARGETS}
    history = []
    for it in range(args.n_iter):
        cfg = random_config(rng)
        score = evaluate_config(cfg, segments, phasemix=args.phasemix,
                                per_target=args.per_target)
        if score is None:
            continue
        if args.per_target:
            per_stem = {t: float(s) for t, s in zip(TARGETS, score)}
            mean_score = float(np.mean(score))
            history.append({**cfg, "oracle_sdr": mean_score, "per_target": per_stem})
            new_best_stems = []
            for t in TARGETS:
                if best_per_target[t] is None or per_stem[t] > best_per_target[t]["oracle_sdr"]:
                    best_per_target[t] = {**cfg, "oracle_sdr": per_stem[t]}
                    new_best_stems.append(t)
            stems_str = " ".join(f"{t}={per_stem[t]:.3f}" for t in TARGETS)
            tag = f" NEW BEST[{','.join(new_best_stems)}]" if new_best_stems else ""
            print(f"[{it}]{tag} oracle SDR mean {mean_score:.3f} dB ({stems_str}): {cfg}")
            score = mean_score
        else:
            history.append({**cfg, "oracle_sdr": score})
        if best is None or score > best["oracle_sdr"]:
            best = history[-1]
            if not args.per_target:
                print(f"[{it}] NEW BEST oracle SDR {score:.3f} dB: {cfg}")
        elif not args.per_target:
            print(f"[{it}] oracle SDR {score:.3f} dB: {cfg}")
        if args.output_json:
            out = {"best": best, "history": history}
            if args.per_target:
                out["best_per_target"] = best_per_target
            with open(args.output_json, "w") as f:
                json.dump(out, f, indent=2)

    print(f"\nbest config: {best}")
    if args.per_target:
        for t in TARGETS:
            print(f"best[{t}]: {best_per_target[t]}")
        return {"best": best, "best_per_target": best_per_target}
    return best


if __name__ == "__main__":
    slicqfinder_main()
