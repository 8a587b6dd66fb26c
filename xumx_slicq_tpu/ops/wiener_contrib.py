"""Auxiliary Wiener-filter utilities (norbert.contrib equivalents).

Re-derivation of the reference's vendored norbert/contrib.py (residual
spectral-subtraction model, Gaussian smoothing, interference reduction,
logit filter compression). Not used by the main separation path
(SURVEY.md 2.3) but part of the reference's public surface.
"""

import numpy as np
import scipy.ndimage

import jax.numpy as jnp

_EPS = float(np.finfo(np.float32).eps)


def _logit(w, threshold, slope):
    return 1.0 / (1.0 + jnp.exp(-slope * (w - threshold)))


def residual_model(v: jnp.ndarray, x: jnp.ndarray, alpha: float = 1, autoscale: bool = False) -> jnp.ndarray:
    """Residual source via spectral subtraction (norbert/contrib.py:11-77).

    v: (B, frames, bins, ch, srcs) source spectrograms;
    x: (B, frames, bins, ch) complex mixture.
    Returns v with an appended residual source."""
    vx = jnp.maximum(jnp.abs(x) ** alpha, _EPS)
    v_total = v.sum(-1)
    if autoscale:
        gain = jnp.sum(vx * v_total, axis=1)
        weights = jnp.sum(v_total * v_total, axis=1) + _EPS
        v = v * (gain / weights)[:, None, ..., None]
        v_total = v.sum(-1)
    vr = jnp.maximum(vx - v_total, 0.0)
    return jnp.concatenate([v, vr[..., None]], axis=-1)


def smooth(v: np.ndarray, width: float = 1, temporal: bool = False) -> np.ndarray:
    """Gaussian blur (host-side scipy, norbert/contrib.py:80-105)."""
    v = np.asarray(v)
    if temporal:
        return scipy.ndimage.gaussian_filter1d(v, sigma=width, axis=0)
    return scipy.ndimage.gaussian_filter(v, sigma=width, truncate=width)


def reduce_interferences(v: jnp.ndarray, thresh: float = 0.6, slope: float = 15) -> jnp.ndarray:
    """Sparsify spectrograms along the source axis
    (norbert/contrib.py:108-151, after Pratzlich et al. 2015)."""
    eps = 1e-7
    vs = jnp.asarray(smooth(np.asarray(v), 10))
    total = eps + vs.sum(-1, keepdims=True)
    return _logit(vs / total, thresh, slope) * v


def compress_filter(W: jnp.ndarray, thresh: float = 0.6, slope: float = 15) -> jnp.ndarray:
    """Logit 'binarization' of a separation filter
    (norbert/contrib.py:154-188)."""
    nb_channels = W.shape[-1]
    if nb_channels > 1:
        gains = jnp.einsum("...ii", W)
        return W * (_logit(gains, thresh, slope) / (_EPS + gains))[..., None, None]
    return _logit(W, thresh, slope)
