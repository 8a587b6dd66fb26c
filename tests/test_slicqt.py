"""sliCQT tests: round-trip accuracy + golden coefficient/signal parity vs
the reference torch implementation (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops.slicqt import SliCQT

from conftest import reference_available, import_reference


@pytest.fixture(scope="module")
def small_t():
    return SliCQT(scale="bark", fbins=50, fmin=50.0)


@pytest.fixture(scope="module")
def small_ref(small_t):
    if not reference_available():
        pytest.skip("reference checkout not available")
    import_reference()
    from xumx_slicq_v2.nsgt import NSGT_sliced, BarkScale

    scl = BarkScale(50.0, 22050.0, 50)
    return NSGT_sliced(
        scl, small_t.sllen, small_t.trlen, 44100.0, real=True, multichannel=True, device="cpu"
    )


def _rand_signal(channels=2, length=int(1.1 * 44100), seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((channels, length)).astype(np.float32)


def test_canonical_roundtrip():
    t = SliCQT()  # bark-262, the flagship config
    assert (t.sllen, t.trlen, t.nfreqs) == (18060, 4516, 263)
    assert len(t.buckets) == 70
    L = 2 * 44100
    x = _rand_signal(length=L)[None]
    y = t.backward(t.forward(jnp.asarray(x)), L)
    err = float(jnp.abs(y - x).max())
    assert err < 5e-6, err


def test_small_roundtrip_matches_reference_error(small_t, small_ref):
    """Round-trip error is a property of the frame; ours must match the
    reference's error on the same config, not just be 'small'."""
    import torch

    L = int(1.1 * 44100)
    x = _rand_signal(length=L)
    ref_C = small_ref.forward((torch.from_numpy(x),))
    ref_y = small_ref.backward([c.clone() for c in ref_C], L).numpy()
    ref_err = np.abs(ref_y - x).max()

    y = np.asarray(small_t.backward(small_t.forward(jnp.asarray(x[None])), L))[0]
    my_err = np.abs(y - x).max()
    assert abs(my_err - ref_err) < 1e-4
    # and our inverse agrees with theirs on identical inputs
    np.testing.assert_allclose(y, ref_y, atol=2e-5)


def test_slicing_golden(small_t, small_ref):
    import torch

    import_reference()
    from xumx_slicq_v2.nsgt.slicing import slicing

    x = _rand_signal()
    ref_sl = torch.stack(
        list(slicing((torch.from_numpy(x),), small_t.sllen, small_t.trlen))
    ).numpy()  # (S, C, sllen)
    mine = np.asarray(small_t.slice_signal(jnp.asarray(x[None])))[0]  # (C, S, sllen)
    assert mine.shape[1] == ref_sl.shape[0]
    np.testing.assert_array_equal(np.moveaxis(mine, 1, 0), ref_sl)


def test_forward_coefficients_golden(small_t, small_ref):
    import torch

    x = _rand_signal()
    ref_C = small_ref.forward((torch.from_numpy(x),))
    mine_C = small_t.forward(jnp.asarray(x[None]))
    assert len(ref_C) == len(mine_C)
    for rc, mc in zip(ref_C, mine_C):
        rc = rc.numpy()  # (S, C, F, M)
        mc = np.transpose(np.asarray(mc)[0], (2, 0, 1, 3))
        assert mc.shape == rc.shape
        np.testing.assert_allclose(mc, rc, atol=2e-5)


def test_backward_golden(small_t, small_ref):
    import torch

    x = _rand_signal(seed=3)
    L = x.shape[-1]
    ref_C = small_ref.forward((torch.from_numpy(x),))
    ref_y = small_ref.backward([c.clone() for c in ref_C], L).numpy()
    mine_C = [jnp.asarray(np.transpose(c.numpy(), (1, 2, 0, 3))[None]) for c in ref_C]
    my_y = np.asarray(small_t.backward(mine_C, L))[0]
    np.testing.assert_allclose(my_y, ref_y, atol=2e-5)


def test_forward_grad_flows(small_t):
    """The transform must be differentiable end to end (training computes
    gradients through forward; offline model also through Wiener)."""
    x = jnp.asarray(_rand_signal(length=22050)[None])

    def loss(x):
        C = small_t.forward(x)
        return sum(jnp.sum(jnp.abs(c) ** 2) for c in C)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_n_slices_and_shapes(small_t):
    for L in [1000, 22050, 44100, 100000]:
        x = jnp.zeros((1, 2, L), jnp.float32)
        C = small_t.forward(x)
        S = small_t.n_slices(L)
        shapes = small_t.block_shapes(1, 2, L)
        assert [c.shape for c in C] == shapes
        assert C[0].shape[3] == S
