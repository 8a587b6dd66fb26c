"""Separator: the inference engine (TPU-native re-design of the reference's
separator.py).

Differences from the reference (sevagh/xumx-sliCQ-V2 separator.py:45-387),
driven by XLA's compilation model:

* The whole chunk pipeline (sliCQT -> Unmix -> Wiener/phasemix -> iSliCQT)
  is ONE jitted function compiled once per chunk shape. The reference's
  Python loops (70 blocks x 4 targets per chunk) become a single XLA
  program.
* Chunked streaming keeps the reference's contract (default chunk_size
  2,621,440 samples ~ 59.4 s, separator.py:53) but pads the last chunk to
  the full chunk size so only one executable is ever compiled. Zero padding
  is exact: slicing, the CDAE, BN (eval), and Wiener-EM statistics are all
  invariant to appended zero slices.
* Runtime backends are JAX device choices ("jax-tpu" / "jax-cpu") instead
  of torch/ONNX providers; weights load either from our native msgpack
  checkpoints or directly from reference .pth files via
  models.torch_import.
* The JSON manifest contract is kept: `xumx_slicq_tpu.json` has the same
  `args` schema the reference uses to rebuild the exact transform geometry
  (separator.py:321-337), and reference `xumx_slicq_v2.json` manifests are
  accepted as-is.
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .models import Unmix
from .ops.slicqt import SliCQT
from .utils import enable_compilation_cache

_SUPPORTED_RUNTIMES = ["jax-tpu", "jax-cpu", "jax-auto"]

MANIFEST_NAMES = ("xumx_slicq_tpu.json", "xumx_slicq_v2.json")


def _resolve_device(runtime_backend: str):
    if runtime_backend not in _SUPPORTED_RUNTIMES:
        raise ValueError(
            f"requested runtime backend {runtime_backend} not in {_SUPPORTED_RUNTIMES}"
        )
    if runtime_backend == "jax-cpu":
        cpus = jax.devices("cpu")
        return cpus[0]
    if runtime_backend == "jax-tpu":
        for d in jax.devices():
            if d.platform != "cpu":
                return d
        raise RuntimeError("no accelerator device available for jax-tpu backend")
    return jax.devices()[0]


def load_manifest(model_path: Path) -> dict:
    for name in MANIFEST_NAMES:
        p = model_path / name
        if p.exists():
            with open(p) as f:
                return json.load(f)
    raise FileNotFoundError(f"no manifest ({'/'.join(MANIFEST_NAMES)}) in {model_path}")


class Separator:
    """Demix stereo mixtures into 4 stems.

    Output stacking follows the reference's target order contract
    (separator.py:48, matching data.py): bass, vocals, other, drums.
    """

    sources = ["bass", "vocals", "other", "drums"]

    def __init__(
        self,
        slicqt: SliCQT,
        model: Unmix,
        params: dict,
        batch_stats: dict,
        sample_rate: float = 44100.0,
        chunk_size: Optional[int] = 2621440,
        device=None,
        mesh=None,
        quiet: bool = True,
    ):
        """`mesh`: optional 1-axis jax.sharding.Mesh. When given, a single
        track's chunk batch is sharded over the mesh axis (weights
        replicated) so one song fans out across chips — the multi-chip
        analogue of the reference's single-GPU chunk loop
        (separator.py:150-180). Mutually exclusive with `device`."""
        enable_compilation_cache()
        self.slicqt = slicqt
        self.model = model
        self.sample_rate = sample_rate
        self.chunk_size = chunk_size if chunk_size is not None else sys.maxsize
        self.quiet = quiet
        self.device = device
        self.mesh = mesh
        if mesh is not None:
            if device is not None:
                raise ValueError("pass either device or mesh, not both")
            from jax.sharding import NamedSharding, PartitionSpec
            self._axis = mesh.axis_names[0]
            rep = NamedSharding(mesh, PartitionSpec())
            params = jax.device_put(params, rep)
            batch_stats = jax.device_put(batch_stats, rep)
            self._data_sharding = NamedSharding(mesh, PartitionSpec(self._axis))
        elif device is not None:
            params = jax.device_put(params, device)
            batch_stats = jax.device_put(batch_stats, device)
        self.params = params
        self.batch_stats = batch_stats
        self._chunk_fns = {}

    # -- jitted chunk pipeline ----------------------------------------------

    def _chunk_fn(self, chunk_len: int):
        if chunk_len in self._chunk_fns:
            return self._chunk_fns[chunk_len]

        slicqt = self.slicqt
        model = self.model
        mesh_mode = self.mesh is not None

        def run(params, batch_stats, audio):
            # inference is eval-only: fold BatchNorm into the conv weights
            # INSIDE the traced program (cdae.fold_cdae_batchnorm — removes
            # the 70-bucket BN normalize pass over the activations; the fold
            # itself is a few elementwise ops on the weights, fused by XLA)
            if not getattr(model, "lstm", False):
                params = model.fold_batchnorm(params, batch_stats)
                batch_stats = None
            X = slicqt.forward(audio)                       # list[(B,C,F,S,M)]
            Y, _, _ = model.apply(params, batch_stats, X, train=False)
            # fold the target axis into batch for one inverse transform. In
            # mesh mode fold BATCH-major so the sharded chunk axis stays
            # outermost (target-major interleaves the shards, forcing a
            # cross-chip regroup before synthesis).
            if mesh_mode:
                Yb = [jnp.moveaxis(y, 0, 1).reshape((-1,) + y.shape[2:]) for y in Y]
                est = slicqt.backward(Yb, chunk_len)        # (B*4, C, L)
                est = est.reshape(-1, 4, est.shape[1], chunk_len)
                return jnp.moveaxis(est, 1, 0)              # (4, B, C, L)
            Yb = [y.reshape((-1,) + y.shape[2:]) for y in Y]
            est = slicqt.backward(Yb, chunk_len)            # (4*B, C, L)
            return est.reshape(4, -1, est.shape[1], chunk_len)

        self._chunk_fns[chunk_len] = jax.jit(run)
        return self._chunk_fns[chunk_len]

    # -- public API ----------------------------------------------------------

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        return self.forward(audio)

    _CHUNK_BATCH_BUCKETS = (1, 2, 4, 8)

    def _wave_dispatch(self, chunk: int, nchunks: int, stage):
        """The single wave/bucket dispatch loop shared by the host-staged
        mesh path and the device-resident path: tracks longer than the
        largest chunk bucket run in multiple full-mesh WAVES (cap = largest
        bucket x n_dev chunks per device call) instead of falling back to a
        single-device loop — the multi-chip analogue of the reference's
        sequential chunk loop (separator.py:147-158). `stage(ci, take, nb)`
        returns the (nb, C, chunk) block for chunks [ci, ci+take) placed
        however the caller needs. Returns per-wave (4, take, C, chunk)
        device arrays."""
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        cap = self._CHUNK_BATCH_BUCKETS[-1] * n_dev
        fn = self._chunk_fn(chunk)
        parts = []
        ci = 0
        while ci < nchunks:
            take = min(nchunks - ci, cap)
            bucket = next(b for b in self._CHUNK_BATCH_BUCKETS if b * n_dev >= take)
            blk = stage(ci, take, bucket * n_dev)
            parts.append(fn(self.params, self.batch_stats, blk)[:, :take])
            ci += take
        return parts

    def _forward_mesh_single(self, audio: np.ndarray, chunk: int, nchunks: int) -> np.ndarray:
        """One track over the mesh: the chunk axis is sharded across
        devices; weights are replicated so the jitted pipeline partitions
        with no cross-chip collectives."""
        _, C, N = audio.shape

        def stage(ci, take, nb):
            flat = np.zeros((nb, C, chunk), audio.dtype)
            for k in range(take):
                lo = (ci + k) * chunk
                hi = min(lo + chunk, N)
                flat[k, :, : hi - lo] = audio[0, :, lo:hi]
            return jax.device_put(flat, self._data_sharding)

        parts = [np.asarray(p) for p in self._wave_dispatch(chunk, nchunks, stage)]
        est = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        est = est.transpose(0, 2, 1, 3)                             # (4, C, nchunks, chunk)
        return est.reshape(4, 1, C, nchunks * chunk)[..., :N]

    def forward(self, audio_big: np.ndarray) -> np.ndarray:
        """audio_big: (B, C, N) -> stacked estimates (4, B, C, N).

        For a single track (B == 1) all chunks are folded into the batch
        axis and processed in ONE device call (chunk counts padded to a
        small bucket set to bound recompiles); otherwise chunks are
        dispatched asynchronously so transfers overlap execution. With a
        mesh, chunks shard across devices in full-mesh waves; batched
        inputs fan each item over the mesh in turn (same compiled
        executables)."""
        B, C, N = audio_big.shape
        chunk = min(self.chunk_size, max(N, self.slicqt.sllen // 2 + 1))
        nchunks = -(-N // chunk)

        if self.mesh is not None:
            if B == 1:
                return self._forward_mesh_single(audio_big, chunk, nchunks)
            return np.concatenate(
                [
                    self._forward_mesh_single(audio_big[b: b + 1], chunk, nchunks)
                    for b in range(B)
                ],
                axis=1,
            )

        if B == 1 and nchunks > 1 and nchunks <= self._CHUNK_BATCH_BUCKETS[-1]:
            nb = next(b for b in self._CHUNK_BATCH_BUCKETS if b >= nchunks)
            flat = np.zeros((nb, C, chunk), audio_big.dtype)
            for ci in range(nchunks):
                lo = ci * chunk
                hi = min(lo + chunk, N)
                flat[ci, :, : hi - lo] = audio_big[0, :, lo:hi]
            a = jnp.asarray(flat) if self.device is None else jax.device_put(flat, self.device)
            fn = self._chunk_fn(chunk)
            est = np.asarray(fn(self.params, self.batch_stats, a))  # (4, nb, C, chunk)
            est = est[:, :nchunks].transpose(0, 2, 1, 3)            # (4, C, nchunks, chunk)
            return est.reshape(4, 1, C, nchunks * chunk)[..., :N]

        fn = self._chunk_fn(chunk)
        pend = []
        for ci in range(nchunks):
            lo = ci * chunk
            hi = min(lo + chunk, N)
            a = audio_big[..., lo:hi]
            if hi - lo < chunk:
                a = np.concatenate(
                    [a, np.zeros((*a.shape[:-1], chunk - (hi - lo)), a.dtype)], axis=-1
                )
            a = jnp.asarray(a) if self.device is None else jax.device_put(a, self.device)
            pend.append((fn(self.params, self.batch_stats, a), hi - lo))
        return np.concatenate(
            [np.asarray(est)[..., :n] for est, n in pend], axis=-1
        )

    def forward_device(self, audio) -> "jnp.ndarray":
        """Device-resident single-track forward: (1, C, N) audio already on
        (or staged to) the device -> (4, 1, C, N) estimates that STAY on the
        device. Chunk split/pad/reassembly run as eager device ops around
        the same cached jitted chunk executables as `forward` — no extra
        tracing per track length, and no host round-trip of the stems
        (the device-resident evaluation path scores them in place,
        ops/bsseval.py::DeviceBssEval)."""
        audio = jnp.asarray(audio)
        if self.device is not None:
            audio = jax.device_put(audio, self.device)
        B, C, N = audio.shape
        if B != 1:
            raise ValueError("forward_device is single-track (B == 1)")
        chunk = min(self.chunk_size, max(N, self.slicqt.sllen // 2 + 1))
        nchunks = -(-N // chunk)

        a = jnp.pad(audio[0], ((0, 0), (0, nchunks * chunk - N)))
        a = a.reshape(C, nchunks, chunk).swapaxes(0, 1)     # (nchunks, C, chunk)

        def stage(ci, take, nb):
            blk = jnp.pad(a[ci: ci + take], ((0, nb - take), (0, 0), (0, 0)))
            if self.mesh is not None:
                blk = jax.device_put(blk, self._data_sharding)
            return blk

        parts = self._wave_dispatch(chunk, nchunks, stage)
        est = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        est = jnp.swapaxes(est, 1, 2).reshape(4, C, nchunks * chunk)[..., :N]
        return est[:, None]                                  # (4, 1, C, N)

    def clone(self, device) -> "Separator":
        """Cheap per-device clone: shares the transform/model specs and the
        already-loaded weights (device_put, no manifest re-parse or weight
        re-load), with a fresh executable cache for the new device."""
        return Separator(
            self.slicqt, self.model, self.params, self.batch_stats,
            sample_rate=self.sample_rate, chunk_size=self.chunk_size,
            device=device, quiet=self.quiet,
        )

    def warmup(self, reps: int = 1, duration_s: float = 100.0):
        """Compile/execute on random audio (reference separator.py:83-91).
        `quiet=False` reports per-rep progress (first rep pays the jit)."""
        rng = np.random.default_rng(0)
        for r in range(reps):
            t0 = time.time()
            w = rng.random((1, 2, int(duration_s * self.sample_rate)), np.float32)
            self.forward(w)
            if not self.quiet:
                print(f"warmup {r + 1}/{reps}: {time.time() - t0:.1f}s", file=sys.stderr)

    @staticmethod
    def to_dict(estimates: np.ndarray, aggregate_dict: Optional[dict] = None) -> dict:
        """Stacked (4, B, C, N) -> {target: (B, C, N)} (separator.py:234-259)."""
        d = {t: estimates[k] for k, t in enumerate(Separator.sources)}
        if aggregate_dict is not None:
            agg = {}
            for key in aggregate_dict:
                agg[key] = sum(d[t] for t in aggregate_dict[key])
            d = agg
        return d

    # -- loading -------------------------------------------------------------

    @classmethod
    def load(
        cls,
        chunk_size: Optional[int] = 2621440,
        model_path: Optional[str] = None,
        runtime_backend: str = "jax-auto",
        warmup: int = 0,
        realtime: bool = False,
        mesh=None,
        quiet: bool = True,
        synth_staging: str = "f32",
        grouped_wiener: bool = False,
    ) -> "Separator":
        """Build a Separator from a model directory.

        The directory must hold a JSON manifest plus either our native
        `params.msgpack` or a reference-style `xumx_slicq_v2.pth`.
        `mesh`: optional 1-axis Mesh for multi-chip chunk-sharded
        inference (overrides runtime_backend's device choice).
        `synth_staging`: "bf16" stages the synthesis assembly through
        split re/im bf16 planes (inference fast path; ~1.5e-3 relative
        output error, see SliCQT).
        `grouped_wiener`: size-class grouped Wiener-EM — numerically
        equivalent to the per-bucket default (a runtime choice, so the
        manifest's training-time value is deliberately NOT consulted);
        ~32% faster first compile, slower steady-state."""
        device = None if mesh is not None else _resolve_device(runtime_backend)

        if model_path is None:
            raise ValueError(
                "model_path is required (no bundled pretrained weights in this build)"
            )
        model_path = Path(model_path).expanduser()
        manifest = load_manifest(model_path)
        args = manifest["args"]

        slicqt = SliCQT(
            scale=args["fscale"],
            fbins=args["fbins"],
            fmin=args["fmin"],
            fgamma=args.get("fgamma", 0.0),
            fs=args.get("sample_rate", 44100.0),
            synth_staging=synth_staging,
        )
        seq_dur = args.get("seq_dur", 2.0)
        shapes = slicqt.block_shapes(1, args.get("nb_channels", 2), int(seq_dur * slicqt.fs))
        manifest_realtime = args.get("realtime", realtime)
        if "realtime" in args and bool(args["realtime"]) != bool(realtime) and realtime:
            # the manifest records which variant the weights were trained as;
            # it wins (the reference instead selects a different model dir per
            # mode, separator.py:268-270 — with one dir we can only warn)
            print(
                f"warning: --realtime={realtime} ignored; manifest at {model_path} "
                f"declares realtime={args['realtime']} (weights define the variant)",
                file=sys.stderr,
            )
        model = Unmix(shapes, realtime=manifest_realtime, lstm=args.get("lstm", False),
                      hidden_size_1=args.get("hidden_size_1", 50),
                      hidden_size_2=args.get("hidden_size_2", 51),
                      time_filter_2=args.get("time_filter_2", 4),
                      grouped_wiener=grouped_wiener)

        params, batch_stats = load_model_weights(model_path, model, len(shapes))

        sep = cls(
            slicqt,
            model,
            params,
            batch_stats,
            sample_rate=args.get("sample_rate", 44100.0),
            chunk_size=chunk_size,
            device=device,
            mesh=mesh,
            quiet=quiet,
        )
        if warmup > 0:
            sep.warmup(warmup)
        return sep


def load_model_weights(model_path: Path, model: Unmix, n_blocks: int):
    """Load weights: native msgpack first, then reference .pth import."""
    native = model_path / "params.msgpack"
    if native.exists():
        from flax import serialization

        params, batch_stats = model.init(jax.random.PRNGKey(0))
        with open(native, "rb") as f:
            blob = serialization.from_bytes({"params": params, "batch_stats": batch_stats}, f.read())
        return blob["params"], blob["batch_stats"]

    for pth_name in ("xumx_slicq_tpu.pth", "xumx_slicq_v2.pth"):
        pth = model_path / pth_name
        if pth.exists():
            from .models.torch_import import load_torch_params

            downsample = [spec.nb_f_bins * spec.nb_channels > 10 for spec in model.specs] if model.lstm else None
            return load_torch_params(str(pth), n_blocks, lstm=model.lstm, downsample_flags=downsample)
    raise FileNotFoundError(f"no weights (params.msgpack or *.pth) found in {model_path}")


def save_model_weights(model_path: Path, params: dict, batch_stats: dict):
    from flax import serialization

    model_path = Path(model_path)
    model_path.mkdir(parents=True, exist_ok=True)
    with open(model_path / "params.msgpack", "wb") as f:
        f.write(serialization.to_bytes({"params": params, "batch_stats": batch_stats}))
