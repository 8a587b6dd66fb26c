"""Unmix: the full 4-target mask network over all sliCQT buckets.

Re-design of the reference's `Unmix` (sevagh/xumx-sliCQ-V2 model.py:29-82):
one CDAE (or LSTM) mask model per bucket, with the multichannel Wiener-EM
(offline) or mix-phase (realtime) reconstruction embedded in the forward
pass (model.py:263-269). The per-bucket Python loop exists only at trace
time; under jit the whole network is one XLA program.

Parameters/state are plain pytrees:
    params      = {"blocks": [per-bucket param dict, ...]}
    batch_stats = {"blocks": [per-bucket BN state, ...]}
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import wiener as wiener_ops
from .cdae import NB_TARGETS, SlicedCDAESpec, apply_cdae, init_cdae_batch_stats, init_cdae_params
from .lstm import SlicedLSTMSpec, apply_lstm, init_lstm_batch_stats, init_lstm_params


class Unmix:
    """Functional model: specs are static, parameters are pytrees.

    block_shapes: list of (B, C, F, S, T) shapes from SliCQT.block_shapes
    (the sample jagged input parameterizes the architecture, mirroring
    NSGTBase.predict_input_size -> Unmix.__init__ in the reference).
    """

    def __init__(
        self,
        block_shapes: Sequence[Tuple[int, ...]],
        realtime: bool = False,
        lstm: bool = False,
        input_means: Optional[Sequence] = None,
        input_scales: Optional[Sequence] = None,
        wiener_iterations: int = 1,
        hidden_size_1: int = 50,
        hidden_size_2: int = 51,
        time_filter_2: int = 4,
        amp: bool = False,
        grouped_wiener: bool = False,
    ):
        """amp: bf16 mixed precision — conv/matmul operands in bf16 with
        fp32 accumulation (MXU-native), the TPU equivalent of the
        reference's bf16 autocast training scope (training.py:69-70).
        Master weights, BN, Wiener-EM, and losses stay fp32.

        grouped_wiener: run the offline post-filter as one EM chain per M
        size class instead of one per bucket (ops/wiener.py
        wiener_blocks_grouped) — exact per-bucket semantics. Measured
        SLOWER at inference (0.182 vs 0.139 s/track steady-state: the
        class pad+concat+split materializes boundary buffers XLA otherwise
        fuses away) but 32% faster to first-compile (147.8 vs 218.6 s) —
        useful for many-config sweeps like slicqfinder; PERFORMANCE.md
        round-5 log has the A/B."""
        self.realtime = realtime
        self.lstm = lstm
        self.amp = amp
        self.grouped_wiener = grouped_wiener
        self.wiener_iterations = wiener_iterations
        self.specs: List = []
        for shape in block_shapes:
            _, C, F, S, T = shape
            if lstm:
                self.specs.append(
                    SlicedLSTMSpec(nb_channels=C, nb_f_bins=F, nb_t_bins=T, realtime=realtime, amp=amp)
                )
            else:
                self.specs.append(
                    SlicedCDAESpec(
                        nb_channels=C, nb_f_bins=F, nb_t_bins=T, realtime=realtime,
                        hidden_size_1=hidden_size_1, hidden_size_2=hidden_size_2,
                        time_filter_2=time_filter_2, amp=amp,
                    )
                )
        self._input_means = input_means
        self._input_scales = input_scales

    # -- init ----------------------------------------------------------------

    def init(self, key) -> Tuple[dict, dict]:
        """Initialize (params, batch_stats) as ONE jitted program.

        The unjitted body dispatches ~20 tiny RNG ops per bucket x 70
        buckets; on a remote-tunneled device each dispatch pays the
        ~27 ms control-plane round-trip (~3.5 min total, measured round
        5). Jitted, init is one executable (persistent-cached across
        processes). The LSTM variant keeps the direct path (its init
        program is much larger to compile than it saves)."""
        if self.lstm:
            return self._init(key)
        if not hasattr(self, "_init_jit"):
            self._init_jit = jax.jit(self._init)
        return self._init_jit(key)

    def _init(self, key) -> Tuple[dict, dict]:
        keys = jax.random.split(key, len(self.specs))
        blocks = []
        stats = []
        for i, (k, spec) in enumerate(zip(keys, self.specs)):
            if self.lstm:
                p = init_lstm_params(k, spec)
                s = init_lstm_batch_stats(spec)
            else:
                p = init_cdae_params(k, spec)
                s = init_cdae_batch_stats(spec)
            # dataset whitening statistics (training.py:115-154 -> model.py:192-203)
            if self._input_means is not None:
                p["input_mean"] = jnp.asarray(-self._input_means[i], jnp.float32)
            if self._input_scales is not None:
                p["input_scale"] = jnp.asarray(1.0 / self._input_scales[i], jnp.float32)
            blocks.append(p)
            stats.append(s)
        return {"blocks": blocks}, {"blocks": stats}

    # -- forward -------------------------------------------------------------

    def apply(
        self,
        params: dict,
        batch_stats: dict,
        Xcomplex: Sequence[jnp.ndarray],
        train: bool = False,
        rng=None,
    ):
        """Forward over all buckets.

        Xcomplex: list of (B, C, F, S, T) complex mixture blocks.
        rng: PRNGKey for train-time stochasticity (LSTM inter-layer
        dropout, reference model.py:345); ignored in eval / CDAE mode.
        Returns (Ycomplex list of (4, B, C, F, S, T) complex,
                 Ymasks list of (4, B, C, F, S, T) float,
                 new_batch_stats)."""
        n = len(self.specs)
        stats_per_block: List = [None] * n
        bn_blocks = batch_stats["blocks"] if batch_stats is not None else [None] * n

        Ymags = []
        Ymasks = []
        for i, (spec, p, bn, Xb) in enumerate(
            zip(self.specs, params["blocks"], bn_blocks, Xcomplex)
        ):
            Xmag = jnp.abs(Xb)
            if self.lstm:
                block_rng = jax.random.fold_in(rng, i) if rng is not None else None
                masks, nbn = apply_lstm(p, bn, Xmag, spec, train=train, rng=block_rng)
            else:
                masks, nbn = apply_cdae(p, bn, Xmag, spec, train=train)
            Ymags.append(masks * Xmag[None])  # multiplicative skip connection
            Ymasks.append(masks)
            stats_per_block[i] = nbn
        if self.realtime:
            Ycomplex = wiener_ops.phasemix_blocks(Xcomplex, Ymags)
        elif self.grouped_wiener:
            Ycomplex = wiener_ops.wiener_blocks_grouped(
                Xcomplex, Ymags, self.wiener_iterations
            )
        else:
            Ycomplex = wiener_ops.wiener_blocks(Xcomplex, Ymags, self.wiener_iterations)
        if batch_stats is None:
            return Ycomplex, Ymasks, None
        return Ycomplex, Ymasks, {"blocks": stats_per_block}

    def fold_batchnorm(self, params: dict, batch_stats: dict) -> dict:
        """Eval-time BatchNorm folding over all buckets (CDAE only) — see
        cdae.fold_cdae_batchnorm. The returned params are consumed with
        batch_stats=None; training must keep the unfolded originals."""
        if self.lstm:
            raise ValueError("BN folding applies to the CDAE variant only")
        from .cdae import fold_cdae_batchnorm

        return {
            "blocks": [
                fold_cdae_batchnorm(p, bn)
                for p, bn in zip(params["blocks"], batch_stats["blocks"])
            ]
        }

    # -- info ----------------------------------------------------------------

    def num_params(self, params: dict) -> int:
        return sum(int(x.size) for x in jax.tree.leaves(params))
