"""Training losses: X-UMX combination losses over the sliCQT domain.

Re-derivation of the reference's loss.py: complex MSE averaged over the 14
X-UMX target combinations (4C1+4C2+4C3) per block then over blocks
(loss.py:37-76), the mask-sum MSE prior (loss.py:79-96), and a
scale-dependent SDR time-domain loss replacing auraloss.time.SDSDRLoss
(loss.py:5-34; auraloss is not a dependency here).

All functions are pure and jit/grad-compatible. Complex blocks are native
complex64 tensors shaped (4, B, C, F, S, T); the reference's stacked-real
trailing axis is accounted for in the MSE normalization (its mean divides
by 2N; |d|^2 sums re^2+im^2, so inner = mean(|d|^2) / 2).
"""

from typing import List, Sequence

import jax.numpy as jnp

_C1 = [(0,), (1,), (2,), (3,)]
_C2 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_C3 = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
COMBINATIONS = _C1 + _C2 + _C3  # 14 X-UMX combinations


def _inner_complex_mse(pred, target):
    d = pred - target
    # real^2+imag^2, not jnp.abs(d)**2: abs's VJP is NaN at d == 0, which
    # happens wherever prediction matches the target exactly (e.g. the
    # all-zero coefficients of padded/silent audio).
    return jnp.mean(d.real ** 2 + d.imag ** 2) / 2.0


def complex_mse_loss(pred_blocks: Sequence[jnp.ndarray], target_blocks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """14-combination complex MSE (reference loss.py:37-76).

    pred_blocks/target_blocks: lists of (4, B, C, F, S, T) complex.

    Computed in closed form instead of materializing the 14 combination
    sums: with D_i = pred_i - target_i and m_ij = mean(Re(D_i conj(D_j))),
    sum_combos mean|sum_{i in c} D_i|^2 = sum_ij A_ij m_ij where A counts
    co-occurrences over the X-UMX combinations (diag 7, off-diag 3 for
    4C1+4C2+4C3), i.e. = 3*mean|sum_i D_i|^2 + 4*sum_i mean|D_i|^2 -- five
    fused elementwise+reduce passes, no combination tensors. Identical
    value up to summation order."""
    n_targets = pred_blocks[0].shape[0]
    assert n_targets == 4, "combination weights derived for the 4-target X-UMX set"
    total = 0.0
    for pred, target in zip(pred_blocks, target_blocks):
        d = pred - target                              # (4, B, C, F, S, T)
        per = sum(jnp.mean(d[i].real ** 2 + d[i].imag ** 2) for i in range(n_targets))
        s = jnp.sum(d, axis=0)
        full = jnp.mean(s.real ** 2 + s.imag ** 2)
        total += (3.0 * full + 4.0 * per) / (2.0 * len(COMBINATIONS))
    return total / len(pred_blocks)


def mask_sum_loss(mask_blocks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Sum of the 4 target masks should be 1 everywhere (loss.py:79-96)."""
    total = 0.0
    for masks in mask_blocks:
        s = jnp.sum(masks, axis=0)
        total += jnp.mean((s - 1.0) ** 2)
    return total / len(mask_blocks)


def sdsdr_loss(pred_wave: jnp.ndarray, target_wave: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Negative scale-dependent SDR over the 14 combinations
    (reference loss.py:5-34 via auraloss SD-SDR, Le Roux et al. 2019).

    pred_wave/target_wave: (4, B, C, N) time-domain stems."""

    def one(p, t):
        # SD-SDR: 10 log10(||alpha t||^2 / ||p - t||^2), alpha = <p,t>/||t||^2
        alpha = jnp.sum(p * t, axis=-1, keepdims=True) / (
            jnp.sum(t * t, axis=-1, keepdims=True) + eps
        )
        t_scaled = alpha * t
        num = jnp.sum(t_scaled ** 2, axis=-1)
        den = jnp.sum((p - t) ** 2, axis=-1)
        sdr = 10.0 * jnp.log10((num + eps) / (den + eps))
        return -jnp.mean(sdr)

    total = 0.0
    for combo in COMBINATIONS:
        p = sum(pred_wave[i] for i in combo)
        t = sum(target_wave[i] for i in combo)
        total += one(p, t)
    return total / len(COMBINATIONS)
