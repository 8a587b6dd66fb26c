"""Loss parity tests vs the reference criteria (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from xumx_slicq_tpu import loss as L

from conftest import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _rand_complex_blocks(rng, shapes):
    out = []
    for s in shapes:
        out.append(
            (rng.standard_normal((4,) + s) + 1j * rng.standard_normal((4,) + s)).astype(np.complex64)
        )
    return out


def _import_ref_loss():
    """The reference loss.py imports auraloss (absent here); stub it --
    only the SDR criterion (unused in these tests) touches it."""
    import sys
    import types

    if "auraloss" not in sys.modules:
        fake = types.ModuleType("auraloss")
        fake.time = types.SimpleNamespace(SDSDRLoss=lambda *a, **k: None)
        sys.modules["auraloss"] = fake
    import_reference()
    import xumx_slicq_v2.loss as ref_loss

    return ref_loss


def test_complex_mse_golden():
    import torch

    ComplexMSELossCriterion = _import_ref_loss().ComplexMSELossCriterion

    rng = np.random.default_rng(0)
    shapes = [(2, 2, 3, 4, 8), (2, 2, 5, 4, 12)]
    pred = _rand_complex_blocks(rng, shapes)
    tgt = _rand_complex_blocks(rng, shapes)

    ref_crit = ComplexMSELossCriterion()
    pred_t = [torch.view_as_real(torch.from_numpy(p)) for p in pred]
    tgt_t = [torch.view_as_real(torch.from_numpy(t)) for t in tgt]
    ref = float(ref_crit(pred_t, tgt_t))

    ours = float(L.complex_mse_loss([jnp.asarray(p) for p in pred], [jnp.asarray(t) for t in tgt]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_mask_sum_golden():
    import torch

    MaskSumLossCriterion = _import_ref_loss().MaskSumLossCriterion

    rng = np.random.default_rng(1)
    shapes = [(1, 2, 3, 4, 8), (1, 2, 5, 4, 12)]
    masks = [np.abs(rng.standard_normal((4,) + s)).astype(np.float32) for s in shapes]

    ref = float(MaskSumLossCriterion()([torch.from_numpy(m) for m in masks]))
    ours = float(L.mask_sum_loss([jnp.asarray(m) for m in masks]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sdsdr_properties():
    """SD-SDR loss: perfect estimate -> very negative (high SDR); noise ->
    higher loss; correct combination averaging."""
    rng = np.random.default_rng(2)
    tgt = rng.standard_normal((4, 1, 2, 4096)).astype(np.float32)
    perfect = float(L.sdsdr_loss(jnp.asarray(tgt), jnp.asarray(tgt)))
    noisy = float(L.sdsdr_loss(jnp.asarray(tgt + 0.5 * rng.standard_normal(tgt.shape).astype(np.float32)), jnp.asarray(tgt)))
    assert perfect < -40  # ~ -80 dB SDR
    assert noisy > perfect
