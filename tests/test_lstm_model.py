"""LSTM-variant golden parity vs the reference `_SlicedUnmixLSTM` (torch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.models.torch_import import import_lstm_state_dict

from conftest import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

TINY = dict(scale="mel", fbins=16, fmin=150.0)
SEQ_DUR = 0.35


@pytest.fixture(scope="module")
def tiny():
    t = SliCQT(**TINY)
    L = int(SEQ_DUR * 44100)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    return t, t.forward(jnp.asarray(x))


@pytest.mark.parametrize("realtime", [False, True])
def test_lstm_golden_vs_reference(tiny, realtime):
    import torch

    import_reference()
    from xumx_slicq_v2.model import Unmix as RefUnmix

    t, blocks = tiny
    torch.manual_seed(0)
    jagged = [torch.rand(c.shape) for c in blocks]
    ref_model = RefUnmix(jagged, realtime=realtime, lstm=True)
    ref_model.eval()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    shapes = [c.shape for c in blocks]
    m = Unmix(shapes, realtime=realtime, lstm=True)
    downsample = [s.downsample for s in m.specs]
    params, stats = import_lstm_state_dict(sd, len(blocks), downsample)

    ours_Y, ours_masks, _ = m.apply(params, stats, blocks, train=False)

    X_ref = [torch.view_as_real(torch.from_numpy(np.asarray(c))) for c in blocks]
    with torch.no_grad():
        ref_Y, ref_masks = ref_model(X_ref, return_masks=True)

    for yb, mb, ryb, rmb in zip(ours_Y, ours_masks, ref_Y, ref_masks):
        np.testing.assert_allclose(np.asarray(mb), rmb.numpy(), rtol=1e-3, atol=1e-4)
        r = ryb.numpy()
        np.testing.assert_allclose(
            np.asarray(yb), r[..., 0] + 1j * r[..., 1], rtol=5e-3, atol=5e-4
        )


def test_lstm_grad_flows(tiny):
    t, blocks = tiny
    shapes = [c.shape for c in blocks]
    m = Unmix(shapes, lstm=True)
    params, stats = m.init(jax.random.PRNGKey(0))

    def loss(params):
        Y, _, _ = m.apply(params, stats, blocks, train=False)
        return sum(jnp.sum(jnp.abs(y) ** 2) for y in Y)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
