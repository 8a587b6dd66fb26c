"""Per-bucket convolutional denoising autoencoder (CDAE) mask network.

Re-design of the reference's `_SlicedUnmixCDAE` (sevagh/xumx-sliCQ-V2
model.py:86-271) as a functional JAX module:

* the 4 per-target CDAEs (deep copies in the reference, model.py:183-188)
  become one weight pytree with a leading target axis, applied with
  `jax.vmap` -- one grouped XLA conv program instead of 4 Python dispatches;
* encoder conv1 has time kernel = the bucket's slice window T and stride T/2,
  absorbing the 50% slice overlap (model.py:130-142); decoder mirrors with
  transposed convs; sigmoid output is a soft mask multiplied into the mix;
* the realtime variant left-pads time (causal conv, model.py:274-290).

Architecture hyperparameters (hidden 50/51, time_filter_2=4, frequency
kernel 1/3/5 by block-height thresholds 10/20) follow the reference's
Optuna-tuned values (model.py:88-117).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .nn import amp_op, batch_norm, conv2d, conv_transpose2d, init_bn_params, init_bn_stats, kaiming_uniform_conv

NB_TARGETS = 4


@dataclass(frozen=True)
class SlicedCDAESpec:
    """Static shape/hyperparameter info for one bucket's CDAE."""

    nb_channels: int
    nb_f_bins: int
    nb_t_bins: int
    hidden_size_1: int = 50
    hidden_size_2: int = 51
    time_filter_2: int = 4
    realtime: bool = False
    # bf16 mixed precision: conv/einsum operands in bf16 with fp32
    # accumulation (reference trains under bf16 autocast, training.py:69-70)
    amp: bool = False

    @property
    def freq_filter(self) -> int:
        # thresholds 10/20 choose kernel 1/3/5 (model.py:112-117)
        if self.nb_f_bins < 10:
            return 1
        if self.nb_f_bins < 20:
            return 3
        return 5


def init_cdae_params(key, spec: SlicedCDAESpec) -> dict:
    """Parameters for all 4 targets, stacked on axis 0."""
    fphi = spec.freq_filter
    T = spec.nb_t_bins
    C = spec.nb_channels
    h1, h2, tf2 = spec.hidden_size_1, spec.hidden_size_2, spec.time_filter_2

    keys = jax.random.split(key, 5 * NB_TARGETS)

    params = {
        "enc1_w": jnp.stack([
            kaiming_uniform_conv(keys[0 * NB_TARGETS + t], (h1, C, fphi, T))
            for t in range(NB_TARGETS)
        ]),
        "enc2_w": jnp.stack([
            kaiming_uniform_conv(keys[1 * NB_TARGETS + t], (h2, h1, fphi, tf2))
            for t in range(NB_TARGETS)
        ]),
        # transposed conv weights keep torch's IOHW layout
        "dec1_w": jnp.stack([
            kaiming_uniform_conv(keys[2 * NB_TARGETS + t], (h2, h1, fphi, tf2))
            for t in range(NB_TARGETS)
        ]),
        "dec2_w": jnp.stack([
            kaiming_uniform_conv(keys[3 * NB_TARGETS + t], (h1, C, fphi, T))
            for t in range(NB_TARGETS)
        ]),
        "input_mean": jnp.zeros(spec.nb_f_bins, jnp.float32),
        "input_scale": jnp.ones(spec.nb_f_bins, jnp.float32),
    }
    bias_bound = (1.0 / (spec.hidden_size_1 * fphi * T)) ** 0.5
    params["dec2_b"] = jax.random.uniform(
        keys[-1], (NB_TARGETS, C), jnp.float32, -bias_bound, bias_bound
    )

    def stack_bn(ch):
        one = init_bn_params(ch)
        return jax.tree.map(lambda a: jnp.stack([a] * NB_TARGETS), one)

    params["bn1"] = stack_bn(h1)
    params["bn2"] = stack_bn(h2)
    params["bn3"] = stack_bn(h1)
    return params


def init_cdae_batch_stats(spec: SlicedCDAESpec) -> dict:
    def stack_bn(ch):
        one = init_bn_stats(ch)
        return jax.tree.map(lambda a: jnp.stack([a] * NB_TARGETS), one)

    return {
        "bn1": stack_bn(spec.hidden_size_1),
        "bn2": stack_bn(spec.hidden_size_2),
        "bn3": stack_bn(spec.hidden_size_1),
    }


def _dec2_ola(h: jnp.ndarray, w: jnp.ndarray, spec: SlicedCDAESpec, S: int) -> jnp.ndarray:
    """Final transposed conv (kernel (fphi, T), stride (1, T/2)) as a
    per-frame einsum + static-slice overlap-add.

    XLA lowers strided conv_transpose via lhs_dilation -- for the
    time-kernel T with hop T/2 that convolves a mostly-zero dilated input
    and dominates the whole network's runtime. The 50% hop means every
    output sample receives exactly one even-frame and one odd-frame
    contribution, so the overlap-add is two static shifted adds.

    h: (B, H, F', K) frame features; w: (H, C, fphi, T) torch CT layout.
    Returns (B, C, F'+fphi-1, S, T)."""
    amp = spec.amp
    B, H, Fp, K = h.shape
    fphi, T = w.shape[2], w.shape[3]
    hop = T // 2

    # frequency-axis transpose conv: y[f] = sum_df w[df] h[f-df]
    F_out = Fp + fphi - 1
    hp = jnp.pad(h, ((0, 0), (0, 0), (fphi - 1, fphi - 1), (0, 0)))
    v = jnp.stack([hp[:, :, fphi - 1 - d: fphi - 1 - d + F_out] for d in range(fphi)], axis=3)
    seg = amp_op(lambda a, b: jnp.einsum("bhfdk,hcdt->bcfkt", a, b),
                 v, w, amp=amp)                            # (B,C,F_out,K,T)

    # time overlap-add at hop T/2: frame 2s covers slice s fully; frame
    # 2s+1 covers slice s [T/2,T) then slice s+1 [0,T/2). Slice s therefore
    # receives odd[s-1, hop:] on its first half and odd[s, :hop] on its
    # second — built with pad+concat (fuses on TPU) rather than .at[].add
    # (dynamic-update-slice, a full-buffer read-modify-write).
    K2 = 2 * S
    seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, K2 - K), (0, 0)))
    seg = seg.reshape(B, seg.shape[1], F_out, S, 2, T)
    even = seg[..., 0, :]
    odd = seg[..., 1, :]
    odd_prev = jnp.pad(odd[:, :, :, :-1, hop:], ((0, 0),) * 3 + ((1, 0), (0, 0)))
    return even + jnp.concatenate([odd_prev, odd[..., :hop]], axis=-1)


def _enc1_frames(x5: jnp.ndarray, w: jnp.ndarray, fphi: int, amp: bool = False) -> jnp.ndarray:
    """First conv (kernel (fphi, T), stride (1, T/2)) as frame extraction +
    einsum (offline variant; same rationale as _dec2_ola -- the 50% hop
    means frames are the slices themselves plus a two-slice interleave).

    x5: (B, C, F, S, T); w: (H, C, fphi, T). Returns (B, H, F-fphi+1, 2S-1)."""
    B, C, F, S, T = x5.shape
    hop = T // 2
    # odd frame s spans slice s [T/2,T) then slice s+1 [0,T/2)
    odd = jnp.concatenate([x5[:, :, :, :-1, hop:], x5[:, :, :, 1:, :hop]], axis=-1)
    odd = jnp.pad(odd, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
    frames = jnp.stack([x5, odd], axis=4).reshape(B, C, F, 2 * S, T)[:, :, :, : 2 * S - 1]
    if fphi == 1:
        return amp_op(lambda a, b: jnp.einsum("bcfkt,oct->bofk", a, b),
                      frames, w[:, :, 0], amp=amp)
    # The fphi-wide frequency window as a native conv: with the K frames
    # flattened to a (K*T)-long time axis, kernel (fphi, T) at stride (1, T)
    # computes sum_{c,d,t} frames[b,c,f+d,k,t] * w[o,c,d,t] exactly. A
    # stacked-slice einsum here materializes fphi copies of the frames
    # buffer (the T axis makes it the model's largest tensor) in HBM —
    # ~8 GiB/track of pure im2col traffic; the conv unit windows f
    # implicitly (PERFORMANCE.md roofline, round 3).
    K = frames.shape[3]
    return conv2d(frames.reshape(B, C, F, K * T), w, stride=(1, T), amp=amp)


def fold_cdae_batchnorm(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """Eval-time BatchNorm folding for one bucket's stacked CDAE params.

    conv has no bias, so  BN(conv(x)) = conv(x)·α + δ  with
    α = scale·rsqrt(var+eps), δ = bias − mean·α — α folds into the conv
    weight's out-channel axis and δ becomes a conv bias that XLA fuses
    into the conv epilogue together with the following ReLU, removing a
    full read+write pass over each activation (the 70-bucket BN normalize
    was a measured latency-floor item, PERFORMANCE.md round-4 roofline).
    Exact up to fp rounding; training keeps real BatchNorm. Returns
    params with enc1_b/enc2_b/dec1_b added and bn1/bn2/bn3 removed —
    consumed by apply_cdae(batch_stats=None)."""
    p = {k: v for k, v in params.items() if k not in ("bn1", "bn2", "bn3")}

    def affine(name):
        bp, bs = params[name], batch_stats[name]
        a = bp["scale"] * jax.lax.rsqrt(bs["var"] + eps)
        return a, bp["bias"] - bs["mean"] * a

    a1, p["enc1_b"] = affine("bn1")
    p["enc1_w"] = params["enc1_w"] * a1[:, :, None, None, None]   # (4, O, I, kh, kw)
    a2, p["enc2_b"] = affine("bn2")
    p["enc2_w"] = params["enc2_w"] * a2[:, :, None, None, None]
    a3, p["dec1_b"] = affine("bn3")
    p["dec1_w"] = params["dec1_w"] * a3[:, None, :, None, None]   # torch (4, I, O, kh, kw)
    return p


def _single_target_cdae(x5, p, bn, spec: SlicedCDAESpec, train: bool):
    """One target's CDAE on whitened magnitude x5: (B, C, F, S, T) -> mask.

    bn=None runs the BN-folded eval fast path (fold_cdae_batchnorm): the
    per-layer bias stands in for the absorbed BatchNorm affine."""

    def norm(h, w_key, bn_key):
        if bn is None:
            return h + p[w_key][None, :, None, None], None
        return batch_norm(h, p[bn_key], bn[bn_key], train)

    B, C, F, S, T = x5.shape
    hop = T // 2

    if spec.realtime:
        x = x5.reshape(B, C, F, S * T)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (T - 1, 0)))
        h = conv2d(x, p["enc1_w"], stride=(1, hop), amp=spec.amp)
    else:
        h = _enc1_frames(x5, p["enc1_w"], spec.freq_filter, amp=spec.amp)
    h, bn1 = norm(h, "enc1_b", "bn1")
    h = jax.nn.relu(h)

    h = conv2d(h, p["enc2_w"], amp=spec.amp)
    h, bn2 = norm(h, "enc2_b", "bn2")
    h = jax.nn.relu(h)

    h = conv_transpose2d(h, p["dec1_w"], amp=spec.amp)
    h, bn3 = norm(h, "dec1_b", "bn3")
    h = jax.nn.relu(h)

    y = _dec2_ola(h, p["dec2_w"], spec, S)
    y = y + p["dec2_b"][None, :, None, None, None]
    mask = jax.nn.sigmoid(y)
    if bn is None:
        return mask, None
    return mask, {"bn1": bn1, "bn2": bn2, "bn3": bn3}


def apply_cdae(params: dict, batch_stats: dict, x_mag: jnp.ndarray, spec: SlicedCDAESpec, train: bool = False):
    """All-target CDAE for one bucket.

    x_mag: (B, C, F, S, T) magnitude of the mixture block.
    Returns (masks (4, B, C, F, S, T), new_batch_stats)."""
    B, C, F, S, T = x_mag.shape

    # whitening: per-frequency learned shift/scale (model.py:239-242)
    x = (x_mag + params["input_mean"][None, None, :, None, None]) * params["input_scale"][None, None, :, None, None]

    folded = batch_stats is None
    if folded and train:
        raise ValueError("BN-folded params cannot train (fold_cdae_batchnorm is eval-only)")
    keys = ("enc1_w", "enc2_w", "dec1_w", "dec2_w", "dec2_b") + (
        ("enc1_b", "enc2_b", "dec1_b") if folded else ("bn1", "bn2", "bn3")
    )
    target_params = {k: params[k] for k in keys}

    if folded:
        masks = jax.vmap(lambda p: _single_target_cdae(x, p, None, spec, False)[0])(
            target_params
        )
        return masks, None

    def per_target(p, bn):
        return _single_target_cdae(x, p, bn, spec, train)

    masks, new_bn = jax.vmap(per_target)(target_params, batch_stats)
    return masks, new_bn
