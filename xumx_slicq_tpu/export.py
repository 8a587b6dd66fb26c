"""Model export: serialized StableHLO artifacts via jax.export.

Re-design of the reference's ONNX/TorchScript export (sevagh/xumx-sliCQ-V2
export.py:99-118). The reference exports the Unmix network with per-block
IO names and one dynamic axis (nb_slices); XLA's ahead-of-time path instead
serializes the ENTIRE chunk pipeline (sliCQT -> model -> Wiener/phasemix ->
iSliCQT) with weights embedded as constants, one artifact per chunk-length
bucket (static shapes are what make the TPU program fast; a small bucket
set replaces the dynamic axis).

Artifacts are directories:
    export_dir/
      manifest.json          config + bucket list
      chunk_<len>.stablehlo  serialized jax.export artifact per bucket
Loading (`load_exported`) rehydrates callables that run on any JAX backend.
"""

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from .models import Unmix
from .ops.slicqt import SliCQT
from .separator import Separator, load_manifest, load_model_weights


def build_chunk_fn(slicqt: SliCQT, model: Unmix, params, batch_stats, chunk_len: int):
    """Closed-over-weights chunk pipeline (audio -> 4 stems)."""

    def run(audio):
        # eval-only artifact: BN-folded fast path (see separator._chunk_fn);
        # closed-over weights make the fold a compile-time constant
        if not model.lstm:
            p, bn = model.fold_batchnorm(params, batch_stats), None
        else:
            p, bn = params, batch_stats
        X = slicqt.forward(audio)
        Y, _, _ = model.apply(p, bn, X, train=False)
        Yb = [y.reshape((-1,) + y.shape[2:]) for y in Y]
        est = slicqt.backward(Yb, chunk_len)
        return est.reshape(4, -1, est.shape[1], chunk_len)

    return run


def export_model(model_path: str, output_dir: str, chunk_lens=(44100, 441000, 2621440), batch: int = 1, platforms=None):
    model_path = Path(model_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    manifest = load_manifest(model_path)
    args = manifest["args"]
    slicqt = SliCQT(scale=args["fscale"], fbins=args["fbins"], fmin=args["fmin"],
                    fgamma=args.get("fgamma", 0.0),
                    fs=args.get("sample_rate", 44100.0))
    shapes = slicqt.block_shapes(batch, args.get("nb_channels", 2), int(args.get("seq_dur", 2.0) * slicqt.fs))
    # the full architecture geometry from the manifest: a vqlog fgamma or a
    # tuning-trial hidden size silently defaulting would rebuild a model
    # whose parameter shapes do not match the checkpoint
    model = Unmix(shapes, realtime=args.get("realtime", False), lstm=args.get("lstm", False),
                  hidden_size_1=args.get("hidden_size_1", 50),
                  hidden_size_2=args.get("hidden_size_2", 51),
                  time_filter_2=args.get("time_filter_2", 4))
    params, batch_stats = load_model_weights(model_path, model, len(shapes))

    exported = []
    for clen in chunk_lens:
        fn = build_chunk_fn(slicqt, model, params, batch_stats, clen)
        spec = jax.ShapeDtypeStruct((batch, 2, clen), jnp.float32)
        art = jexport.export(jax.jit(fn), platforms=platforms)(spec)
        blob = art.serialize()
        out = output_dir / f"chunk_{clen}.stablehlo"
        out.write_bytes(blob)
        exported.append({"chunk_len": clen, "file": out.name, "bytes": len(blob)})
        print(f"exported chunk_len={clen}: {len(blob)/1e6:.1f} MB")

    meta = {
        "args": args,
        "batch": batch,
        "chunks": exported,
        "format": "jax.export stablehlo",
    }
    with open(output_dir / "manifest.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class ExportedSeparator:
    """Run exported artifacts (chunk-bucketed) like a Separator."""

    sources = Separator.sources

    def __init__(self, export_dir: str):
        self.dir = Path(export_dir)
        with open(self.dir / "manifest.json") as f:
            self.meta = json.load(f)
        self.sample_rate = self.meta["args"].get("sample_rate", 44100.0)
        self._fns = {}
        self.chunk_lens = sorted(c["chunk_len"] for c in self.meta["chunks"])

    def _fn(self, chunk_len: int):
        if chunk_len not in self._fns:
            fname = next(c["file"] for c in self.meta["chunks"] if c["chunk_len"] == chunk_len)
            art = jexport.deserialize((self.dir / fname).read_bytes())
            self._fns[chunk_len] = jax.jit(art.call)
        return self._fns[chunk_len]

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        B, C, N = audio.shape
        # pick the smallest bucket >= N, else tile the largest
        chunk = next((c for c in self.chunk_lens if c >= N), self.chunk_lens[-1])
        outs = []
        pos = 0
        while pos < N:
            hi = min(pos + chunk, N)
            a = audio[..., pos:hi]
            if hi - pos < chunk:
                a = np.concatenate([a, np.zeros((*a.shape[:-1], chunk - (hi - pos)), a.dtype)], -1)
            est = self._fn(chunk)(jnp.asarray(a))
            outs.append(np.asarray(est)[..., : hi - pos])
            pos = hi
        return np.concatenate(outs, axis=-1)

    to_dict = staticmethod(Separator.to_dict)


def export_main(argv=None):
    parser = argparse.ArgumentParser(description="xumx-sliCQ-TPU Export (StableHLO)")
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--chunk-lens", type=int, nargs="+", default=[44100, 441000, 2621440])
    parser.add_argument("--platforms", type=str, nargs="*", default=None,
                        help="target platforms (e.g. tpu cpu); default = current")
    args = parser.parse_args(argv)
    export_model(args.model_path, args.output_dir, tuple(args.chunk_lens), platforms=args.platforms)


if __name__ == "__main__":
    export_main()
