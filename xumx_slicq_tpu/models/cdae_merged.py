"""Fused CDAE engine for the small frequency blocks.

In the canonical config, 67 of the 70 sliCQT blocks have fewer than 10
frequency bins, so their CDAEs use a frequency kernel of 1 (model.py:112-117
in the reference): every conv is per-bin in frequency with weights shared
within a block. This engine stacks all such blocks into one padded tensor
(bins concatenated, time padded to the largest block T) and computes the
whole 4-layer CDAE for all of them with a few batched einsums:

* enc conv1 (kernel (1,T), stride (1,T/2)) == frame extraction (even frames
  are the slices themselves; odd frames are two per-bin static gathers) +
  one per-bin matmul with zero-padded weights -- exact, since frames are
  zero beyond each block's true T and so are the padded weights;
* enc conv2 / dec deconv1 (kernel (1,4)) == shifted-view einsums;
* dec deconv2 (transpose, stride T/2) == per-frame matmul + overlap-add
  realized with two tiny per-bin gather tables (the 50% hop structure);
* BatchNorm runs with per-block statistics via a one-hot segment matmul.

Numerically equivalent to running models.cdae per block (verified by test);
replaces ~67 blocks x 4 targets x 4 conv layers with ~8 fused ops.
Offline (non-causal) variant only; the realtime path keeps per-block convs.
"""

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .cdae import NB_TARGETS, SlicedCDAESpec


@dataclass
class MergedCDAEPlan:
    """Static tables for the fused engine (NumPy -> XLA constants)."""

    block_ids: List[int]        # indices (into the full spec list) of merged blocks
    Fm: int                     # total bins across merged blocks
    Tp: int                     # padded time length (max T)
    bin2block: np.ndarray       # (Fm,) int32 local block index per bin
    block_onehot: np.ndarray    # (n_small, Fm) float32 segment matrix
    T_of_block: np.ndarray      # (n_small,)
    # per-bin gather tables over the padded T axis (sentinel = Tp -> zero)
    odd_a: np.ndarray           # (Fm, Tp): x[s, odd_a] part of odd frames
    odd_b: np.ndarray           # (Fm, Tp): x[s+1, odd_b] part of odd frames
    ola_r: np.ndarray           # (Fm, Tp): odd-frame right contribution
    ola_l: np.ndarray           # (Fm, Tp): odd-frame left contribution
    f_slices: List[Tuple[int, int]]  # per merged block: (bin offset, F)


def build_merged_plan(specs: List[SlicedCDAESpec]) -> MergedCDAEPlan:
    block_ids = [i for i, s in enumerate(specs) if (not s.realtime) and s.freq_filter == 1]
    small = [specs[i] for i in block_ids]
    Fm = sum(s.nb_f_bins for s in small)
    Tp = max(s.nb_t_bins for s in small)

    bin2block = np.zeros(Fm, np.int32)
    onehot = np.zeros((len(small), Fm), np.float32)
    odd_a = np.full((Fm, Tp), Tp, np.int32)
    odd_b = np.full((Fm, Tp), Tp, np.int32)
    ola_r = np.full((Fm, Tp), Tp, np.int32)
    ola_l = np.full((Fm, Tp), Tp, np.int32)
    f_slices = []
    off = 0
    for bi, s in enumerate(small):
        T = s.nb_t_bins
        h = T // 2
        t = np.arange(Tp)
        rows = slice(off, off + s.nb_f_bins)
        bin2block[rows] = bi
        onehot[bi, rows] = 1.0
        # odd frame u: x[s, h+u] for u < h ; x[s+1, u-h] for h <= u < T
        oa = np.where(t < h, h + t, Tp)
        ob = np.where((t >= h) & (t < T), t - h, Tp)
        # dec2 overlap-add: out[s, t] += odd_seg[s][t-h] (t in [h,T));
        #                   out[s+1, t] += odd_seg[s][h+t] (t < h)
        orr = np.where((t >= h) & (t < T), t - h, Tp)
        oll = np.where(t < h, h + t, Tp)
        odd_a[rows] = oa
        odd_b[rows] = ob
        ola_r[rows] = orr
        ola_l[rows] = oll
        f_slices.append((off, s.nb_f_bins))
        off += s.nb_f_bins

    return MergedCDAEPlan(
        block_ids=block_ids, Fm=Fm, Tp=Tp, bin2block=bin2block,
        block_onehot=onehot, T_of_block=np.asarray([s.nb_t_bins for s in small]),
        odd_a=odd_a, odd_b=odd_b, ola_r=ola_r, ola_l=ola_l, f_slices=f_slices,
    )


def _stack_small_params(params_blocks, plan: MergedCDAEPlan, Tp: int):
    """Stack per-block params into (n_small, ...) tensors, time-padded."""
    def pad_t(w):
        return jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, Tp - w.shape[-1])])

    ps = [params_blocks[i] for i in plan.block_ids]
    # kernels have frequency extent 1 for all merged blocks: squeeze it
    return {
        "enc1_w": jnp.stack([pad_t(p["enc1_w"][:, :, :, 0]) for p in ps]),   # (n,4,50,2,Tp)
        "enc2_w": jnp.stack([p["enc2_w"][:, :, :, 0] for p in ps]),          # (n,4,51,50,4)
        "dec1_w": jnp.stack([p["dec1_w"][:, :, :, 0] for p in ps]),          # (n,4,51,50,4)
        "dec2_w": jnp.stack([pad_t(p["dec2_w"][:, :, :, 0]) for p in ps]),   # (n,4,50,2,Tp)
        "dec2_b": jnp.stack([p["dec2_b"] for p in ps]),                      # (n,4,2)
        "bn": {
            k: {
                "scale": jnp.stack([p[k]["scale"] for p in ps]),             # (n,4,ch)
                "bias": jnp.stack([p[k]["bias"] for p in ps]),
            } for k in ("bn1", "bn2", "bn3")
        },
        "input_mean": jnp.concatenate([params_blocks[i]["input_mean"] for i in plan.block_ids]),   # (Fm,)
        "input_scale": jnp.concatenate([params_blocks[i]["input_scale"] for i in plan.block_ids]),  # (Fm,)
    }


def _stack_small_stats(stats_blocks, plan: MergedCDAEPlan):
    ss = [stats_blocks[i] for i in plan.block_ids]
    return {
        k: {
            "mean": jnp.stack([s[k]["mean"] for s in ss]),   # (n,4,ch)
            "var": jnp.stack([s[k]["var"] for s in ss]),
        } for k in ("bn1", "bn2", "bn3")
    }


def _bn_merged(h, scale_b, bias_b, mean_b, var_b, bin2block, plan, train: bool, eps=1e-5, momentum=0.1):
    """BatchNorm over (B, ch, Fm, K) with per-BLOCK statistics.

    scale_b/... are (n_small, ch). Returns (y, (new_mean_b, new_var_b))."""
    if train:
        # per-bin moments over (B, K), then exact per-block aggregation
        cnt_bk = h.shape[0] * h.shape[3]
        s1 = jnp.sum(h, axis=(0, 3))                    # (ch, Fm)
        s2 = jnp.sum(h * h, axis=(0, 3))
        onehot = jnp.asarray(plan.block_onehot)         # (n, Fm)
        bins_per_block = onehot.sum(1)                  # (n,)
        n_tot = cnt_bk * bins_per_block                 # (n,)
        S1 = jnp.einsum("nf,cf->nc", onehot, s1)
        S2 = jnp.einsum("nf,cf->nc", onehot, s2)
        mean = S1 / n_tot[:, None]
        var = S2 / n_tot[:, None] - mean ** 2
        unbiased = var * (n_tot / jnp.maximum(n_tot - 1, 1))[:, None]
        new_mean = (1 - momentum) * mean_b + momentum * mean
        new_var = (1 - momentum) * var_b + momentum * unbiased
    else:
        mean, var = mean_b, var_b
        new_mean, new_var = mean_b, var_b
    mean_f = mean[bin2block]                            # (Fm, ch)
    inv_f = (jax.lax.rsqrt(var + eps) * scale_b)[bin2block]
    bias_f = bias_b[bin2block]
    y = (h - mean_f.T[None, :, :, None]) * inv_f.T[None, :, :, None] + bias_f.T[None, :, :, None]
    return y, (new_mean, new_var)


def apply_cdae_merged(params_blocks, stats_blocks, x_mag: jnp.ndarray, plan: MergedCDAEPlan, train: bool = False):
    """Fused CDAE over the merged magnitude tensor.

    x_mag: (B, C, Fm, S, Tp) zero-padded magnitudes of all merged blocks.
    Returns (masks (4, B, C, Fm, S, Tp), new_stats list aligned with
    plan.block_ids)."""
    B, C, Fm, S, Tp = x_mag.shape
    K1 = 2 * S - 1
    p = _stack_small_params(params_blocks, plan, Tp)
    st = _stack_small_stats(stats_blocks, plan)
    bin2block = jnp.asarray(plan.bin2block)

    # whitening (per-bin shift/scale)
    x = (x_mag + p["input_mean"][None, None, :, None, None]) * p["input_scale"][None, None, :, None, None]

    # frames: even = slices; odd = two static per-bin gathers (sentinel -> 0)
    x_ext = jnp.concatenate([x, jnp.zeros((B, C, Fm, S, 1), x.dtype)], axis=-1)
    oa = jnp.asarray(plan.odd_a)
    ob = jnp.asarray(plan.odd_b)
    ga = jnp.take_along_axis(x_ext, oa[None, None, :, None, :].repeat(S, 3), axis=-1)
    x_next = jnp.concatenate([x_ext[:, :, :, 1:], jnp.zeros_like(x_ext[:, :, :, :1])], axis=3)
    gb = jnp.take_along_axis(x_next, ob[None, None, :, None, :].repeat(S, 3), axis=-1)
    odd = ga + gb                                        # (B,C,Fm,S,Tp)
    frames = jnp.stack([x, odd], axis=4).reshape(B, C, Fm, 2 * S, Tp)[:, :, :, :K1]

    def per_target(ti):
        W1 = p["enc1_w"][:, ti][bin2block]               # (Fm,50,C,Tp)
        h1 = jnp.einsum("bcfkt,foct->bofk", frames, W1)  # (B,50,Fm,K1)
        h1, bn1 = _bn_merged(h1, p["bn"]["bn1"]["scale"][:, ti], p["bn"]["bn1"]["bias"][:, ti],
                             st["bn1"]["mean"][:, ti], st["bn1"]["var"][:, ti], bin2block, plan, train)
        h1 = jax.nn.relu(h1)

        # enc2: kernel 4 valid
        v = jnp.stack([h1[..., d: K1 - 3 + d] for d in range(4)], axis=-1)   # (B,50,Fm,K2,4)
        W2 = p["enc2_w"][:, ti][bin2block]               # (Fm,51,50,4)
        h2 = jnp.einsum("bofkd,fgod->bgfk", v, W2)       # (B,51,Fm,K2)
        h2, bn2 = _bn_merged(h2, p["bn"]["bn2"]["scale"][:, ti], p["bn"]["bn2"]["bias"][:, ti],
                             st["bn2"]["mean"][:, ti], st["bn2"]["var"][:, ti], bin2block, plan, train)
        h2 = jax.nn.relu(h2)

        # dec1: transpose kernel 4 -> pad + correlate with flipped kernel
        hp = jnp.pad(h2, ((0, 0), (0, 0), (0, 0), (3, 3)))
        v2 = jnp.stack([hp[..., d: d + K1] for d in range(4)], axis=-1)      # (B,51,Fm,K1,4)
        Wd1 = p["dec1_w"][:, ti][bin2block][..., ::-1]   # (Fm,51,50,4) flipped taps
        h3 = jnp.einsum("bgfkd,fgod->bofk", v2, Wd1)     # (B,50,Fm,K1)
        h3, bn3 = _bn_merged(h3, p["bn"]["bn3"]["scale"][:, ti], p["bn"]["bn3"]["bias"][:, ti],
                             st["bn3"]["mean"][:, ti], st["bn3"]["var"][:, ti], bin2block, plan, train)
        h3 = jax.nn.relu(h3)

        # dec2: per-frame matmul then 50%-hop overlap-add
        Wd2 = p["dec2_w"][:, ti][bin2block]              # (Fm,50,C,Tp)
        seg = jnp.einsum("bofk,foct->bcfkt", h3, Wd2)    # (B,C,Fm,K1,Tp)
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))  # frame 2S-1 = 0
        seg = seg.reshape(B, C, Fm, S, 2, Tp)
        even = seg[:, :, :, :, 0]
        odd_seg = seg[:, :, :, :, 1]                     # frame 2s+1, s=0..S-1 (last is zero)
        odd_ext = jnp.concatenate([odd_seg, jnp.zeros((B, C, Fm, S, 1), seg.dtype)], axis=-1)
        rr = jnp.take_along_axis(odd_ext, jnp.asarray(plan.ola_r)[None, None, :, None, :].repeat(S, 3), axis=-1)
        odd_prev = jnp.concatenate([jnp.zeros_like(odd_ext[:, :, :, :1]), odd_ext[:, :, :, :-1]], axis=3)
        ll = jnp.take_along_axis(odd_prev, jnp.asarray(plan.ola_l)[None, None, :, None, :].repeat(S, 3), axis=-1)
        y = even + rr + ll
        y = y + p["dec2_b"][:, ti][bin2block].T[None, :, :, None, None]      # (n,C)->(Fm,C)
        mask = jax.nn.sigmoid(y)
        return mask, (bn1, bn2, bn3)

    masks = []
    new_bns = []
    for ti in range(NB_TARGETS):
        m, bns = per_target(ti)
        masks.append(m)
        new_bns.append(bns)
    masks = jnp.stack(masks)                             # (4,B,C,Fm,S,Tp)

    # reassemble per-block BN stats: (n,4,ch)
    new_stats = []
    for local_bi, spec_idx in enumerate(plan.block_ids):
        entry = {}
        for ki, k in enumerate(("bn1", "bn2", "bn3")):
            entry[k] = {
                "mean": jnp.stack([new_bns[ti][ki][0][local_bi] for ti in range(NB_TARGETS)]),
                "var": jnp.stack([new_bns[ti][ki][1][local_bi] for ti in range(NB_TARGETS)]),
            }
        new_stats.append(entry)
    return masks, new_stats
