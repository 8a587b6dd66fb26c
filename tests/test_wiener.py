"""Wiener-EM / phasemix parity tests vs the reference norbert (torch CPU).

Extends the reference's own test surface (xumx_slicq_v2/tests/test_phase.py:
shape/finiteness of blockwise_wiener and wiener) with numerical golden
parity, gradient flow, and the phasemix path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops import wiener as W

from conftest import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _rand_complex(rng, shape, scale=1.0):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    ) * scale


def test_wiener_golden_vs_norbert():
    import torch

    import_reference()
    import xumx_slicq_v2.norbert as norbert

    rng = np.random.default_rng(0)
    B, F, N, C, S = 2, 17, 9, 2, 4
    x = _rand_complex(rng, (B, F, N, C), scale=3.0)
    v = np.abs(rng.standard_normal((B, F, N, C, S))).astype(np.float32)

    ref = norbert.wiener(torch.from_numpy(v), torch.from_numpy(x), 1, False).numpy()
    ours = np.asarray(W.wiener(jnp.asarray(v), jnp.asarray(x), 1, False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_wiener_multiple_iterations_golden():
    import torch

    import_reference()
    import xumx_slicq_v2.norbert as norbert

    rng = np.random.default_rng(1)
    B, F, N, C, S = 1, 11, 5, 2, 4
    x = _rand_complex(rng, (B, F, N, C))
    v = np.abs(rng.standard_normal((B, F, N, C, S))).astype(np.float32)

    ref = norbert.wiener(torch.from_numpy(v), torch.from_numpy(x), 3, False).numpy()
    ours = np.asarray(W.wiener(jnp.asarray(v), jnp.asarray(x), 3, False))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_softmask_init_golden():
    import torch

    import_reference()
    import xumx_slicq_v2.norbert as norbert

    rng = np.random.default_rng(2)
    B, F, N, C, S = 1, 7, 6, 2, 4
    x = _rand_complex(rng, (B, F, N, C))
    v = np.abs(rng.standard_normal((B, F, N, C, S))).astype(np.float32)

    ref = norbert.wiener(torch.from_numpy(v), torch.from_numpy(x), 0, True).numpy()
    ours = np.asarray(W.wiener(jnp.asarray(v), jnp.asarray(x), 0, True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_blockwise_wiener_golden():
    import torch

    import_reference()
    from xumx_slicq_v2.phase import blockwise_wiener as ref_blockwise

    rng = np.random.default_rng(3)
    B, C, F, S, M = 1, 2, 5, 3, 8
    mix = _rand_complex(rng, (B, C, F, S, M))
    mag = np.abs(rng.standard_normal((4, B, C, F, S, M))).astype(np.float32)

    # reference layout: mix (B, C, F, S, M, 2) stacked-real; mag (4, B, C, F, S, M)
    mix_ref = torch.view_as_real(torch.from_numpy(mix))
    ref = ref_blockwise(mix_ref, torch.from_numpy(mag)).numpy()
    ref_c = ref[..., 0] + 1j * ref[..., 1]

    ours = np.asarray(W.blockwise_wiener(jnp.asarray(mix), jnp.asarray(mag)))
    np.testing.assert_allclose(ours, ref_c, rtol=2e-4, atol=2e-5)


def test_blockwise_phasemix_golden():
    import torch

    import_reference()
    from xumx_slicq_v2.phase import blockwise_phasemix_sep as ref_phasemix

    rng = np.random.default_rng(4)
    B, C, F, S, M = 1, 2, 5, 3, 8
    mix = _rand_complex(rng, (B, C, F, S, M))
    mag = np.abs(rng.standard_normal((4, B, C, F, S, M))).astype(np.float32)

    mix_ref = torch.view_as_real(torch.from_numpy(mix))
    ref = ref_phasemix(mix_ref, torch.from_numpy(mag)).numpy()
    ref_c = ref[..., 0] + 1j * ref[..., 1]

    ours = np.asarray(W.blockwise_phasemix_sep(jnp.asarray(mix), jnp.asarray(mag)))
    np.testing.assert_allclose(ours, ref_c, rtol=1e-4, atol=1e-5)


def test_wiener_shapes_and_finite():
    """Mirror of the reference's own test_phase.py contract."""
    rng = np.random.default_rng(5)
    B, C, F, S, M = 2, 2, 5, 3, 8
    mix = _rand_complex(rng, (B, C, F, S, M))
    mag = np.abs(rng.standard_normal((4, B, C, F, S, M))).astype(np.float32)
    out = W.blockwise_wiener(jnp.asarray(mix), jnp.asarray(mag))
    assert out.shape == (4, B, C, F, S, M)
    assert bool(jnp.isfinite(out.real).all() and jnp.isfinite(out.imag).all())


def test_wiener_grad_flows():
    """Training backprops through the embedded Wiener-EM (model.py:268);
    gradients w.r.t. the magnitude estimates must be finite and nonzero."""
    rng = np.random.default_rng(6)
    B, C, F, S, M = 1, 2, 4, 2, 8
    mix = jnp.asarray(_rand_complex(rng, (B, C, F, S, M)))
    mag = jnp.asarray(np.abs(rng.standard_normal((4, B, C, F, S, M))).astype(np.float32))

    def loss(mag):
        y = W.blockwise_wiener(mix, mag)
        return jnp.sum(jnp.abs(y) ** 2)

    g = jax.grad(loss)(mag)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_grouped_wiener_matches_per_bucket():
    """wiener_blocks_grouped (one EM chain per M size class, the round-5
    dispatch-count lever) must reproduce the per-bucket path exactly up to
    fp reduction order: per-bucket max_abs scales are preserved as per-bin
    vectors and M padding is zeros, which the per-bin frame-covariance
    sums and the filter output are invariant to."""
    rng = np.random.default_rng(7)
    blocks = [(3, 2, 16), (1, 2, 16), (2, 3, 20), (5, 3, 44), (1, 3, 64), (2, 3, 72)]
    B = 1
    mix, mags = [], []
    for F, S, M in blocks:
        mix.append(jnp.asarray(_rand_complex(rng, (B, 2, F, S, M)) * rng.uniform(0.5, 40.0)))
        mags.append(jnp.asarray(np.abs(rng.standard_normal((4, B, 2, F, S, M))).astype(np.float32)))
    # ragged S is not a real configuration; equalize
    mix = [m[:, :, :, :2] for m in mix]
    mags = [m[:, :, :, :, :2] for m in mags]
    for iters in (0, 1, 2):
        y_ref = W.wiener_blocks(mix, mags, iters)
        for ncls in (1, 3, 8):
            y_grp = W.wiener_blocks_grouped(mix, mags, iters, n_classes=ncls)
            for a, b in zip(y_ref, y_grp):
                assert a.shape == b.shape
                scale = float(jnp.abs(a).max()) + 1e-12
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=2e-5 * scale,
                    err_msg=f"iters={iters} n_classes={ncls}",
                )


def test_partition_by_m_bounds():
    """The DP partition must cover every bucket exactly once, respect the
    class budget, and pad no worse than the single-class extreme."""
    Ms = [28, 16, 20, 24, 68, 72, 140, 292]
    Fs = [1, 86, 14, 11, 4, 4, 2, 1]
    for k in (1, 3, 8, 20):
        classes = W.partition_by_m(Ms, Fs, n_classes=k)
        assert sorted(i for c in classes for i in c) == list(range(len(Ms)))
        assert len(classes) <= max(1, min(k, len(Ms)))
        for c in classes:
            assert c  # no empty classes
    # more classes never pads more
    def pad(classes):
        return sum(Fs[i] * (max(Ms[j] for j in c) - Ms[i]) for c in classes for i in c)
    assert pad(W.partition_by_m(Ms, Fs, 8)) <= pad(W.partition_by_m(Ms, Fs, 2))
