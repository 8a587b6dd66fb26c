"""Differentiable multichannel Wiener-EM post-filter (batched JAX).

Re-derivation of the norbert algorithm the reference embeds in its model
forward pass (sevagh/xumx-sliCQ-V2: xumx_slicq_v2/norbert/__init__.py and
phase.py). The model path calls `wiener(v, x, 1, use_softmask=False)` --
mix-phase init plus exactly one EM iteration with the analytic 2x2 complex
inverse -- and backprops through it during training.

Everything here is expressed as batched einsums over complex64 tensors with
static shapes: one fused XLA computation per block, no frame chunking (the
reference chunks frames at wiener_win_len=5000 to bound torch memory,
phase.py:44-59; per-block tensors here are small enough that XLA fuses the
whole thing).

Shape conventions follow norbert:
    v: (B, frames, bins, ch, srcs) float  -- source magnitude estimates
    x: (B, frames, bins, ch) complex      -- mixture sliCQT
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def _abs2(x: jnp.ndarray) -> jnp.ndarray:
    """|x|^2 with finite gradients at x == 0.

    jnp.abs(x)**2 composes abs's VJP (y/|y|, NaN at 0) with the square's,
    yielding 0*NaN = NaN cotangents exactly at zero coefficients — which
    occur in padded/silent audio. real^2+imag^2 is the same value with a
    polynomial gradient everywhere."""
    return x.real ** 2 + x.imag ** 2


def _unit_phase(x: jnp.ndarray) -> jnp.ndarray:
    """exp(i*angle(x)) with finite gradients at x == 0 (where it returns 1,
    matching exp(i*angle(0)) == 1). jnp.angle's gradient at 0 is NaN; zero
    coefficients occur in padded/silent audio, and one quiet batch would
    abort training with a NaN loss (reference has the same torch.angle
    exposure at norbert/__init__.py:230-240 — we don't match the landmine)."""
    nonzero = _abs2(x) > 0.0
    safe = jnp.where(nonzero, x, jnp.asarray(1.0, x.dtype))
    return safe / jnp.sqrt(_abs2(safe))


def _invert2x2(M: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of (..., 2, 2) complex matrices
    (norbert/__init__.py:337-346)."""
    det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    inv_det = 1.0 / det
    row0 = jnp.stack([inv_det * M[..., 1, 1], -inv_det * M[..., 0, 1]], axis=-1)
    row1 = jnp.stack([-inv_det * M[..., 1, 0], inv_det * M[..., 0, 0]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _invert(M: jnp.ndarray, eps: float) -> jnp.ndarray:
    nb_channels = M.shape[-1]
    if nb_channels == 1:
        return 1.0 / (M + eps)
    if nb_channels == 2:
        return _invert2x2(M)
    raise NotImplementedError("only 1 or 2 channels supported (as in the reference path)")


def expectation_maximization(y: jnp.ndarray, x: jnp.ndarray, iterations: int = 2, eps: float = None):
    """EM refinement of source estimates (norbert/__init__.py:10-150).

    y: (B, frames, bins, ch, srcs) complex initial estimates
    x: (B, frames, bins, ch) complex mixture
    Returns refined y (plus v, R as in norbert).
    """
    if eps is None:
        eps = _EPS
    B, F, N, C = x.shape
    S = y.shape[-1]

    if C == 2:
        return _em_stereo(y, x, iterations, eps)

    reg = np.sqrt(eps) * jnp.eye(C, dtype=x.dtype)
    v = R = None
    for _ in range(iterations):
        # local Gaussian model per source (norbert/__init__.py:458-494):
        # PSD v = mean |y|^2 over channels; spatial covariance R = weighted
        # empirical covariance accumulated over frames.
        v = jnp.mean(_abs2(y), axis=3)                               # (B,F,N,S)
        weight = jnp.sum(v, axis=1) + eps                            # (B,N,S)
        cov = jnp.einsum("bfncs,bfnds->bncds", y, y.conj())          # (B,N,C,C,S)
        R = cov / weight[:, :, None, None, :]                        # (B,N,C,C,S)

        # mixture covariance Cxx = sum_s v_s R_s + sqrt(eps) I  (:416-437, :131)
        Cxx = jnp.einsum("bfns,bncds->bfncd", v.astype(R.dtype), R) + reg
        inv_Cxx = _invert(Cxx, eps)                                  # (B,F,N,C,C)

        # Wiener gain G = v_s * R_s inv_Cxx  (:353-388)
        G = jnp.einsum("bncds,bfnde->bfnces", R, inv_Cxx) * v[:, :, :, None, None, :].astype(R.dtype)

        # apply filter: y_s[c] = sum_e G[c,e,s] x[e]  (:391-413)
        y = jnp.einsum("bfnces,bfne->bfncs", G, x)
    return y, v, R


def _em_stereo(y: jnp.ndarray, x: jnp.ndarray, iterations: int, eps: float):
    """C=2 EM with the channel/source axes unrolled into explicit 2x2
    Hermitian algebra (same math as the einsum path / norbert).

    The general path materializes Cxx (B,F,N,C,C) and the per-source gain
    G (B,F,N,C,C,S) -- 8x the mixture tensor -- because tiny C=2/S-sized
    contractions are expressed as einsums, which XLA cannot fuse across.
    Unrolled, everything between the three frame-covariance reductions and
    the output is one elementwise chain: with invC = [[i00,i01],[i01*,i11]]
    and u = invC @ x (shared across sources), y_s = v_s * (R_s @ u).
    Hermitian structure (R10 = R01*, det real) is used throughout, and no
    (C,C)-sized tensor is ever materialized."""
    if iterations <= 0:
        return y, None, None  # match the general path's no-iteration result
    x0, x1 = x[..., 0], x[..., 1]                                     # (B,F,N)
    sqeps = float(np.sqrt(eps))
    for _ in range(iterations):
        y0, y1 = y[..., 0, :], y[..., 1, :]                           # (B,F,N,S)
        a0, a1 = _abs2(y0), _abs2(y1)
        v = 0.5 * (a0 + a1)                                           # (B,F,N,S)
        # covariance accumulated over frames; weight = sum_f v = (c00+c11)/2
        c00 = jnp.sum(a0, axis=1)                                     # (B,N,S) real
        c11 = jnp.sum(a1, axis=1)
        c01 = jnp.sum(y0 * jnp.conj(y1), axis=1)                      # (B,N,S) complex
        w = 0.5 * (c00 + c11) + eps
        R00, R11, R01 = c00 / w, c11 / w, c01 / w
        # Cxx = sum_s v_s R_s + sqrt(eps) I, Hermitian: A01 complex, diag real
        A00 = sum(v[..., s] * R00[:, None, :, s] for s in range(v.shape[-1])) + sqeps
        A11 = sum(v[..., s] * R11[:, None, :, s] for s in range(v.shape[-1])) + sqeps
        A01 = sum(v[..., s].astype(x.dtype) * R01[:, None, :, s] for s in range(v.shape[-1]))
        det = A00 * A11 - _abs2(A01)                                  # real
        i00, i11 = A11 / det, A00 / det                               # real
        i01 = -A01 / det.astype(x.real.dtype)                         # complex; i10 = conj(i01)
        u0 = i00.astype(x.dtype) * x0 + i01 * x1                      # (B,F,N)
        u1 = jnp.conj(i01) * x0 + i11.astype(x.dtype) * x1
        outs0 = [
            v[..., s].astype(x.dtype)
            * (R00[:, None, :, s].astype(x.dtype) * u0 + R01[:, None, :, s] * u1)
            for s in range(v.shape[-1])
        ]
        outs1 = [
            v[..., s].astype(x.dtype)
            * (jnp.conj(R01[:, None, :, s]) * u0 + R11[:, None, :, s].astype(x.dtype) * u1)
            for s in range(v.shape[-1])
        ]
        y = jnp.stack([jnp.stack(outs0, axis=-1), jnp.stack(outs1, axis=-1)], axis=-2)
    R = jnp.stack([
        jnp.stack([R00.astype(x.dtype), R01], axis=-2),
        jnp.stack([jnp.conj(R01), R11.astype(x.dtype)], axis=-2),
    ], axis=-3)                                                       # (B,N,C,C,S)
    return y, v, R


def softmask(v: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Single-channel ratio mask (norbert/__init__.py:263-309)."""
    total = jnp.sum(v, axis=-1, keepdims=True)
    mask = v / (_EPS + total)
    return mask * x[..., None]


def wiener(v: jnp.ndarray, x: jnp.ndarray, iterations: int = 1, use_softmask: bool = False, eps: float = None) -> jnp.ndarray:
    """Multichannel Wiener separation (norbert/__init__.py:153-260).

    The model path uses iterations=1, use_softmask=False: initial estimates
    are mix-phase (v * exp(i angle(x))), scaled by max(1, 0.1 max|x|) for
    stability, refined by one EM pass, rescaled.
    """
    if use_softmask:
        y = softmask(v, x)
    else:
        phase = _unit_phase(x)[..., None]
        y = v.astype(x.real.dtype) * phase

    if not iterations:
        return y

    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(x)) * 0.1)
    y = expectation_maximization(y / max_abs, x / max_abs, iterations, eps=eps)[0]
    return y * max_abs


# ---------------------------------------------------------------------------
# block-level wrappers over our sliCQT block layout
# ---------------------------------------------------------------------------


def blockwise_wiener(mix_block: jnp.ndarray, mag_est: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Wiener-EM over one sliCQT bucket (reference phase.py:18-69).

    mix_block: (B, C, F, S, M) complex mixture coefficients
    mag_est:   (4, B, C, F, S, M) float magnitude estimates per target
    returns    (4, B, C, F, S, M) complex target estimates
    """
    nb_targets, B, C, F, S, M = mag_est.shape
    frames = S * M
    x = mix_block.reshape(B, C, F, frames)
    x = jnp.transpose(x, (0, 3, 2, 1))                 # (B, frames, F, C)
    v = mag_est.reshape(nb_targets, B, C, F, frames)
    v = jnp.transpose(v, (1, 4, 3, 2, 0))              # (B, frames, F, C, T)

    y = wiener(v, x, iterations=iterations, use_softmask=False)

    y = jnp.transpose(y, (4, 0, 3, 2, 1))              # (T, B, C, F, frames)
    return y.reshape(nb_targets, B, C, F, S, M)


def blockwise_phasemix_sep(mix_block: jnp.ndarray, mag_est: jnp.ndarray) -> jnp.ndarray:
    """Mix-phase reconstruction Y = mag * exp(i angle(X))
    (reference phase.py:96-113) -- the realtime model's post-filter."""
    phase = _unit_phase(mix_block)
    return mag_est.astype(mix_block.real.dtype) * phase[None]


def wiener_blocks(mix_blocks: Sequence[jnp.ndarray], mag_blocks: Sequence[jnp.ndarray], iterations: int = 1) -> List[jnp.ndarray]:
    """Apply blockwise_wiener across the bucket list (phase.py:7-15)."""
    return [blockwise_wiener(x, v, iterations) for x, v in zip(mix_blocks, mag_blocks)]


# ---------------------------------------------------------------------------
# size-class grouped Wiener: one EM chain per M size class instead of one per
# bucket -- SURVEY.md section 7.1's bucket-grouping design point, measured in
# round 5 (PERFORMANCE.md): SLOWER at inference (0.182 vs 0.139 s/track; the
# class pad+concat+split adds ~24 GiB/run of boundary materialization that
# XLA's per-bucket fusion never pays, even though each added op runs at
# 465-513 GiB/s) but -32% first-compile time and half the trace time. Kept as
# an option for many-config compile-bound sweeps; exact per-bucket semantics.
# ---------------------------------------------------------------------------


def partition_by_m(Ms: Sequence[int], Fs: Sequence[int], n_classes: int = 8) -> List[List[int]]:
    """Partition bucket indices into <= n_classes size classes by their time
    resolution M, minimizing total zero padding sum F_b * (M_class - M_b)
    via exact DP over the M-sorted order. Returns a list of index lists;
    each class pads its members' M to the class maximum."""
    order = sorted(range(len(Ms)), key=lambda i: Ms[i])
    m = [Ms[i] for i in order]
    f = [Fs[i] for i in order]
    n = len(m)
    K = min(n_classes, n)
    cost = [[0] * (n + 1) for _ in range(n + 1)]
    for i in range(n):
        for j in range(i + 1, n + 1):
            mc = m[j - 1]
            cost[i][j] = sum(f[k] * (mc - m[k]) for k in range(i, j))
    INF = float("inf")
    dp = [[INF] * (K + 1) for _ in range(n + 1)]
    par = [[0] * (K + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for j in range(1, n + 1):
        for k in range(1, K + 1):
            for i in range(j):
                c = dp[i][k - 1] + cost[i][j]
                if c < dp[j][k]:
                    dp[j][k] = c
                    par[j][k] = i
    classes: List[List[int]] = []
    j, k = n, K
    while j > 0:
        i = par[j][k]
        classes.append([order[t] for t in range(i, j)])
        j, k = i, k - 1
    return classes[::-1]


def _em_stereo_native(y: jnp.ndarray, x: jnp.ndarray, iterations: int, eps: float) -> jnp.ndarray:
    """_em_stereo in the NATIVE block layout — x: (B, C, N, T) complex,
    y: (S, B, C, N, T) complex — with the frame-covariance reduction over
    the minor (last) axis. Same math as _em_stereo / norbert; no layout
    transposes (the grouped path's norbert-layout transposes were measured
    to cost more than the grouping saved, PERFORMANCE.md round 5)."""
    x0, x1 = x[:, 0], x[:, 1]                                         # (B,N,T)
    sqeps = float(np.sqrt(eps))
    nS = y.shape[0]
    for _ in range(iterations):
        y0, y1 = y[:, :, 0], y[:, :, 1]                               # (S,B,N,T)
        a0, a1 = _abs2(y0), _abs2(y1)
        v = 0.5 * (a0 + a1)                                           # (S,B,N,T)
        c00 = jnp.sum(a0, axis=-1)                                    # (S,B,N) real
        c11 = jnp.sum(a1, axis=-1)
        c01 = jnp.sum(y0 * jnp.conj(y1), axis=-1)                     # (S,B,N) complex
        w = 0.5 * (c00 + c11) + eps
        R00, R11, R01 = c00 / w, c11 / w, c01 / w
        A00 = sum(v[s] * R00[s][..., None] for s in range(nS)) + sqeps  # (B,N,T)
        A11 = sum(v[s] * R11[s][..., None] for s in range(nS)) + sqeps
        A01 = sum(v[s].astype(x.dtype) * R01[s][..., None] for s in range(nS))
        det = A00 * A11 - _abs2(A01)
        i00, i11 = A11 / det, A00 / det
        i01 = -A01 / det.astype(x.real.dtype)
        u0 = i00.astype(x.dtype) * x0 + i01 * x1                      # (B,N,T)
        u1 = jnp.conj(i01) * x0 + i11.astype(x.dtype) * x1
        outs0 = [
            v[s].astype(x.dtype)
            * (R00[s][..., None].astype(x.dtype) * u0 + R01[s][..., None] * u1)
            for s in range(nS)
        ]
        outs1 = [
            v[s].astype(x.dtype)
            * (jnp.conj(R01[s][..., None]) * u0 + R11[s][..., None].astype(x.dtype) * u1)
            for s in range(nS)
        ]
        y = jnp.stack([jnp.stack(outs0), jnp.stack(outs1)], axis=2)   # (S,B,C,N,T)
    return y


def wiener_blocks_grouped(
    mix_blocks: Sequence[jnp.ndarray],
    mag_blocks: Sequence[jnp.ndarray],
    iterations: int = 1,
    classes: Sequence[Sequence[int]] = None,
    n_classes: int = 8,
) -> List[jnp.ndarray]:
    """blockwise_wiener over all buckets, one EM chain per M size class,
    computed in the native block layout (no norbert-layout transposes).

    Exact per-bucket equivalence: each bucket keeps its OWN norbert
    stability scale max(1, 0.1*max|x_b|) (applied as a per-bin vector
    before the class EM and inverted after; norbert/__init__.py:257 per
    block), and M padding is zeros -- zeros contribute nothing to the
    per-bin frame-covariance sums, the filter output at padded positions
    is 0, and the padding is sliced off on the split, so every real
    position computes the same chain as the ungrouped path (up to fp
    reduction order).

    mix_blocks: list of (B, C, F_b, S, M_b) complex; mag_blocks: matching
    (4, B, C, F_b, S, M_b) float. Returns the per-bucket estimate list.
    """
    if mix_blocks[0].shape[1] != 2:
        # the unrolled native EM is stereo-only (like _em_stereo); mono
        # falls back to the per-bucket general path
        return wiener_blocks(mix_blocks, mag_blocks, iterations)
    Ms = [x.shape[-1] for x in mix_blocks]
    Fs = [x.shape[2] for x in mix_blocks]
    if classes is None:
        classes = partition_by_m(Ms, Fs, n_classes)
    nb_targets = mag_blocks[0].shape[0]
    out: List = [None] * len(mix_blocks)
    for members in classes:
        Mc = max(Ms[i] for i in members)
        B, C, _, S, _ = mix_blocks[members[0]].shape
        inv_ma = []
        xs, vs = [], []
        for i in members:
            x = mix_blocks[i]
            v = mag_blocks[i]
            ma = jnp.maximum(1.0, jnp.max(jnp.abs(x)) * 0.1)
            inv_ma.append(jnp.full((Fs[i],), 1.0, jnp.float32) / ma)
            pad = Mc - Ms[i]
            if pad:
                x = jnp.pad(x, ((0, 0),) * 4 + ((0, pad),))
                v = jnp.pad(v, ((0, 0),) * 5 + ((0, pad),))
            xs.append(x.reshape(B, C, Fs[i], S * Mc))
            vs.append(v.reshape(nb_targets, B, C, Fs[i], S * Mc))
        scale = jnp.concatenate(inv_ma)                    # (Fc,)
        xc = jnp.concatenate(xs, axis=2) * scale[None, None, :, None]
        vc = jnp.concatenate(vs, axis=3) * scale[None, None, None, :, None]
        # mix-phase init + EM in the native layout; the per-bucket prescale
        # already realizes each bucket's max_abs, so no further scaling
        y = vc.astype(xc.dtype) * _unit_phase(xc)[None]    # (T,B,C,Fc,S*Mc)
        if iterations:
            y = _em_stereo_native(y, xc, iterations, _EPS)
        y = y * (1.0 / scale)[None, None, None, :, None]
        f0 = 0
        for i in members:
            yb = y[:, :, :, f0: f0 + Fs[i]].reshape(nb_targets, B, C, Fs[i], S, Mc)
            out[i] = yb[..., : Ms[i]]
            f0 += Fs[i]
    return out


def phasemix_blocks(mix_blocks: Sequence[jnp.ndarray], mag_blocks: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Apply blockwise_phasemix_sep across the bucket list (phase.py:122-126)."""
    return [blockwise_phasemix_sep(x, v) for x, v in zip(mix_blocks, mag_blocks)]
