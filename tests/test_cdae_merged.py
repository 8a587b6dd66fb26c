"""Merged small-block CDAE engine: exact equivalence with the per-block path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.models import Unmix


def _blocks_for(t, L, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 2, L)).astype(np.float32)
    return t.forward(jnp.asarray(x))


@pytest.mark.parametrize("cfg", [
    dict(scale="mel", fbins=12, fmin=200.0, L=int(0.4 * 44100)),
    dict(scale="bark", fbins=50, fmin=50.0, L=int(0.6 * 44100)),
])
def test_merged_matches_per_block_eval(cfg):
    t = SliCQT(scale=cfg["scale"], fbins=cfg["fbins"], fmin=cfg["fmin"])
    C = _blocks_for(t, cfg["L"])
    shapes = [c.shape for c in C]

    m_ref = Unmix(shapes, merge_small_blocks=False)
    params, stats = m_ref.init(jax.random.PRNGKey(0))
    Y0, M0, _ = m_ref.apply(params, stats, C, train=False)

    m_fast = Unmix(shapes, merge_small_blocks=True)
    Y1, M1, _ = m_fast.apply(params, stats, C, train=False)

    assert len(m_fast._merged_plan.block_ids) >= 2
    for a, b in zip(M0, M1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)
    for a, b in zip(Y0, Y1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4)


def test_merged_matches_per_block_train_stats():
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    C = _blocks_for(t, int(0.4 * 44100), seed=1)
    shapes = [c.shape for c in C]

    m_ref = Unmix(shapes, merge_small_blocks=False)
    params, stats = m_ref.init(jax.random.PRNGKey(1))
    _, M0, S0 = m_ref.apply(params, stats, C, train=True)

    m_fast = Unmix(shapes, merge_small_blocks=True)
    _, M1, S1 = m_fast.apply(params, stats, C, train=True)

    for a, b in zip(M0, M1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)
    # BN running statistics must agree block by block
    flat0 = jax.tree.leaves(S0)
    flat1 = jax.tree.leaves(S1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_merged_grads_match():
    t = SliCQT(scale="mel", fbins=12, fmin=200.0)
    C = _blocks_for(t, int(0.3 * 44100), seed=2)
    shapes = [c.shape for c in C]
    m_ref = Unmix(shapes, merge_small_blocks=False)
    m_fast = Unmix(shapes, merge_small_blocks=True)
    params, stats = m_ref.init(jax.random.PRNGKey(2))

    def loss(model):
        def f(params):
            Y, M, _ = model.apply(params, stats, C, train=True)
            return sum(jnp.sum(jnp.abs(y) ** 2) for y in Y) + sum(jnp.sum(m) for m in M)
        return f

    g0 = jax.grad(loss(m_ref))(params)
    g1 = jax.grad(loss(m_fast))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2, atol=2e-3)
