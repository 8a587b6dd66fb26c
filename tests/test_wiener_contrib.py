"""norbert.contrib equivalents: golden parity vs the reference (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from xumx_slicq_tpu.ops import wiener_contrib as WC

from conftest import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _ref_contrib():
    import_reference()
    import xumx_slicq_v2.norbert.contrib as ref

    return ref


def test_residual_model_golden():
    import torch

    ref = _ref_contrib()
    rng = np.random.default_rng(0)
    B, F, N, C, S = 1, 7, 5, 2, 4
    v = np.abs(rng.standard_normal((B, F, N, C, S))).astype(np.float32)
    x = (rng.standard_normal((B, F, N, C)) + 1j * rng.standard_normal((B, F, N, C))).astype(np.complex64)

    out_ref = ref.residual_model(torch.from_numpy(v.copy()), torch.from_numpy(x), 1, False).numpy()
    ours = np.asarray(WC.residual_model(jnp.asarray(v), jnp.asarray(x), 1, False))
    np.testing.assert_allclose(ours, out_ref, rtol=1e-5, atol=1e-6)

    out_ref2 = ref.residual_model(torch.from_numpy(v.copy()), torch.from_numpy(x), 1, True).numpy()
    ours2 = np.asarray(WC.residual_model(jnp.asarray(v), jnp.asarray(x), 1, True))
    np.testing.assert_allclose(ours2, out_ref2, rtol=1e-4, atol=1e-5)


def test_smooth_golden():
    ref = _ref_contrib()
    rng = np.random.default_rng(1)
    v = rng.standard_normal((20, 8)).astype(np.float64)
    np.testing.assert_allclose(WC.smooth(v, 2, temporal=True), ref.smooth(v, 2, temporal=True), rtol=1e-6)
    np.testing.assert_allclose(WC.smooth(v, 2, temporal=False), ref.smooth(v, 2, temporal=False), rtol=1e-6)


def test_reduce_interferences_golden():
    import torch

    ref = _ref_contrib()
    rng = np.random.default_rng(2)
    v = np.abs(rng.standard_normal((10, 6, 4))).astype(np.float32)
    out_ref = ref.reduce_interferences(torch.from_numpy(v.copy())).numpy()
    ours = np.asarray(WC.reduce_interferences(jnp.asarray(v)))
    np.testing.assert_allclose(ours, out_ref, rtol=1e-4, atol=1e-5)


def test_compress_filter_golden():
    import torch

    ref = _ref_contrib()
    rng = np.random.default_rng(3)
    W = np.abs(rng.standard_normal((5, 6, 2, 2))).astype(np.float32)
    out_ref = ref.compress_filter(torch.from_numpy(W.copy())).numpy()
    ours = np.asarray(WC.compress_filter(jnp.asarray(W)))
    np.testing.assert_allclose(ours, out_ref, rtol=1e-5, atol=1e-6)
