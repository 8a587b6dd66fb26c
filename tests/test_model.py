"""Model tests: CDAE/LSTM forward shapes, mask ranges, gradient flow, and
golden parity vs the reference torch `Unmix` with identical (imported)
random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.models.torch_import import import_cdae_state_dict

from conftest import reference_available, import_reference

# tiny config: few buckets, small tensors -> fast reference execution
TINY = dict(scale="mel", fbins=12, fmin=200.0)
SEQ_DUR = 0.4


@pytest.fixture(scope="module")
def tiny_t():
    return SliCQT(**TINY)


@pytest.fixture(scope="module")
def tiny_blocks(tiny_t):
    L = int(SEQ_DUR * 44100)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    return tiny_t.forward(jnp.asarray(x))


def test_unmix_forward_shapes(tiny_t, tiny_blocks):
    shapes = [c.shape for c in tiny_blocks]
    m = Unmix(shapes)
    params, stats = m.init(jax.random.PRNGKey(0))
    Y, masks, _ = m.apply(params, stats, tiny_blocks, train=False)
    for c, y, mk in zip(tiny_blocks, Y, masks):
        assert y.shape == (4,) + c.shape
        assert mk.shape == (4,) + c.shape
        assert float(mk.min()) >= 0.0 and float(mk.max()) <= 1.0
        assert bool(jnp.isfinite(y.real).all())


def test_unmix_train_updates_stats(tiny_t, tiny_blocks):
    shapes = [c.shape for c in tiny_blocks]
    m = Unmix(shapes)
    params, stats = m.init(jax.random.PRNGKey(0))
    _, _, new_stats = m.apply(params, stats, tiny_blocks, train=True)
    before = stats["blocks"][0]["bn1"]["mean"]
    after = new_stats["blocks"][0]["bn1"]["mean"]
    assert float(jnp.abs(after - before).max()) > 0


def test_unmix_grad_flows(tiny_t, tiny_blocks):
    shapes = [c.shape for c in tiny_blocks]
    m = Unmix(shapes)
    params, stats = m.init(jax.random.PRNGKey(1))

    def loss(params):
        Y, masks, _ = m.apply(params, stats, tiny_blocks, train=True)
        return sum(jnp.sum(jnp.abs(y) ** 2) for y in Y)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


@pytest.mark.skipif(not reference_available(), reason="reference not available")
@pytest.mark.parametrize("realtime", [False, True])
def test_unmix_golden_vs_reference(tiny_t, tiny_blocks, realtime):
    import torch

    import_reference()
    from xumx_slicq_v2.model import Unmix as RefUnmix

    torch.manual_seed(0)
    # reference jagged sample input: (B, C, F, S, T) magnitude tensors
    jagged = [torch.rand(c.shape) for c in tiny_blocks]
    ref_model = RefUnmix(jagged, realtime=realtime)
    ref_model.eval()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = import_cdae_state_dict(sd, len(tiny_blocks))

    shapes = [c.shape for c in tiny_blocks]
    m = Unmix(shapes, realtime=realtime)
    ours_Y, ours_masks, _ = m.apply(params, stats, tiny_blocks, train=False)

    X_ref = [torch.view_as_real(torch.from_numpy(np.asarray(c))) for c in tiny_blocks]
    with torch.no_grad():
        ref_Y, ref_masks = ref_model(X_ref, return_masks=True)

    for yb, mb, ryb, rmb in zip(ours_Y, ours_masks, ref_Y, ref_masks):
        r = ryb.numpy()
        r_c = r[..., 0] + 1j * r[..., 1]
        np.testing.assert_allclose(np.asarray(mb), rmb.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yb), r_c, rtol=2e-3, atol=2e-4)


def test_unmix_param_count_canonical():
    """The flagship bark-262 model must have exactly the reference's
    15,010,446 parameters (README.md:13, verified by execution)."""
    t = SliCQT()
    shapes = t.block_shapes(1, 2, 2 * 44100)
    m = Unmix(shapes)
    params, _ = m.init(jax.random.PRNGKey(0))
    assert m.num_params(params) == 15_010_446
