"""Equivalence tests for the TPU fast paths against their reference-shaped
fallbacks.

Round 2 rewrote the hot paths (Hermitian-half analysis/synthesis, fused
assembly gather, unrolled stereo Wiener-EM, closed-form combination MSE)
as algebraic transformations of the golden-verified originals. These tests
pin each fast path to its fallback so the algebra cannot silently drift.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops import make_slicqt
from xumx_slicq_tpu.ops import wiener as W
from xumx_slicq_tpu import loss as L


@pytest.fixture(scope="module")
def canonical():
    return make_slicqt()  # bark-262: mixed-radix + Hermitian-half plans active


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.standard_normal((1, 2, 2 * 44100)).astype(np.float32))


def test_forward_half_matches_full(canonical, audio):
    """Hermitian-half analysis == full-spectrum analysis per block."""
    t = canonical
    assert t._fwd_half is not None
    fast = jax.jit(t.forward)(audio)
    saved = t._fwd_half
    t._fwd_half = None
    try:
        full = jax.jit(t.forward)(audio)
    finally:
        t._fwd_half = saved
    for a, b in zip(fast, full):
        scale = float(jnp.abs(b).max()) + 1e-12
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_backward_fused_matches_unfused(canonical, audio):
    """Fused (n2, h1)-gather synthesis == gather->half-spectrum->iDFT."""
    t = canonical
    assert t._v2_idx is not None
    blocks = jax.jit(t.forward)(audio)
    L_out = audio.shape[-1]
    fused = jax.jit(lambda bl: t.backward(bl, L_out))(blocks)
    saved = t._v2_idx
    t._v2_idx = None
    try:
        unfused = jax.jit(lambda bl: t.backward(bl, L_out))(blocks)
    finally:
        t._v2_idx = saved
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=2e-6)


def test_em_stereo_matches_einsum_form():
    """Unrolled 2x2 Hermitian EM == the general einsum formulation."""
    rng = np.random.default_rng(0)
    B, F, N, C, S = 2, 40, 6, 2, 4
    y = (rng.standard_normal((B, F, N, C, S)) + 1j * rng.standard_normal((B, F, N, C, S))).astype(np.complex64)
    x = (rng.standard_normal((B, F, N, C)) + 1j * rng.standard_normal((B, F, N, C))).astype(np.complex64)
    eps = float(np.finfo(np.float32).eps)

    got, v_got, R_got = W.expectation_maximization(jnp.asarray(y), jnp.asarray(x), iterations=2)

    # general einsum reference (the pre-unroll formulation)
    yj = jnp.asarray(y)
    xj = jnp.asarray(x)
    reg = np.sqrt(eps) * jnp.eye(C, dtype=xj.dtype)
    for _ in range(2):
        v = jnp.mean(yj.real ** 2 + yj.imag ** 2, axis=3)
        weight = jnp.sum(v, axis=1) + eps
        cov = jnp.einsum("bfncs,bfnds->bncds", yj, yj.conj())
        R = cov / weight[:, :, None, None, :]
        Cxx = jnp.einsum("bfns,bncds->bfncd", v.astype(R.dtype), R) + reg
        det = Cxx[..., 0, 0] * Cxx[..., 1, 1] - Cxx[..., 0, 1] * Cxx[..., 1, 0]
        inv = jnp.stack([
            jnp.stack([Cxx[..., 1, 1], -Cxx[..., 0, 1]], axis=-1),
            jnp.stack([-Cxx[..., 1, 0], Cxx[..., 0, 0]], axis=-1),
        ], axis=-2) / det[..., None, None]
        G = jnp.einsum("bncds,bfnde->bfnces", R, inv) * v[:, :, :, None, None, :].astype(R.dtype)
        yj = jnp.einsum("bfnces,bfne->bfncs", G, xj)

    np.testing.assert_allclose(np.asarray(got), np.asarray(yj), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(R_got), np.asarray(R), rtol=2e-4, atol=2e-5)


def test_complex_mse_closed_form_matches_bruteforce():
    """Closed-form combination MSE == materializing the 14 combination sums."""
    rng = np.random.default_rng(3)
    shapes = [(4, 2, 2, 3, 5, 8), (4, 2, 2, 1, 5, 16)]
    pred = [jnp.asarray((rng.standard_normal(s) + 1j * rng.standard_normal(s)).astype(np.complex64)) for s in shapes]
    tgt = [jnp.asarray((rng.standard_normal(s) + 1j * rng.standard_normal(s)).astype(np.complex64)) for s in shapes]

    got = float(L.complex_mse_loss(pred, tgt))

    total = 0.0
    for p, t in zip(pred, tgt):
        bl = 0.0
        for combo in L.COMBINATIONS:
            d = sum(p[i] for i in combo) - sum(t[i] for i in combo)
            bl += float(jnp.mean(d.real ** 2 + d.imag ** 2)) / 2.0
        total += bl / len(L.COMBINATIONS)
    total /= len(pred)

    assert abs(got - total) / abs(total) < 1e-5
