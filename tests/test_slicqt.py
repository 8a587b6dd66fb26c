"""sliCQT tests: round-trip accuracy + golden coefficient/signal parity vs
the reference torch implementation (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xumx_slicq_tpu.ops.slicqt import SliCQT

from conftest import reference_available, import_reference


# golden parity must hold on every first-class scale, not just bark
# (reference transforms.py:30-48 treats all of these as equal citizens; a
# vqlog/mel-specific bug in the bucket-table or mirror construction would
# otherwise slip through)
GOLDEN_CONFIGS = [
    ("bark", 50, 50.0, 0.0),
    ("mel", 128, 30.0, 0.0),
    ("vqlog", 70, 40.0, 25.0),
    ("cqlog", 99, 40.0, 0.0),
    ("linear", 96, 40.0, 0.0),
]


@pytest.fixture(
    scope="module", params=GOLDEN_CONFIGS, ids=[f"{c[0]}-{c[1]}" for c in GOLDEN_CONFIGS]
)
def small_t(request):
    scale, fbins, fmin, fgamma = request.param
    return SliCQT(scale=scale, fbins=fbins, fmin=fmin, fgamma=fgamma)


@pytest.fixture(scope="module")
def small_ref(small_t):
    if not reference_available():
        pytest.skip("reference checkout not available")
    import_reference()
    from xumx_slicq_v2.nsgt import NSGT_sliced

    return NSGT_sliced(
        _ref_scale(small_t), small_t.sllen, small_t.trlen, 44100.0,
        real=True, multichannel=True, device="cpu"
    )


def _ref_scale(t):
    """Reference Scale object matching a SliCQT's configuration
    (reference transforms.py:30-48 scale-string dispatch)."""
    from xumx_slicq_v2.nsgt.fscale import BarkScale, MelScale, LogScale, LinScale
    from xumx_slicq_v2.nsgt.fscale import MRSTFTScale

    scale, fbins, fmin, fgamma = t.scale_name, t.fbins, t.fmin, t.fgamma
    if scale == "bark":
        return BarkScale(fmin, 22050.0, fbins)
    if scale == "mel":
        return MelScale(fmin, 22050.0, fbins)
    if scale == "linear":
        return LinScale(fmin, 22050.0, fbins)
    if scale == "mrstft":
        return MRSTFTScale()
    return LogScale(fmin, 22050.0, fbins, gamma=fgamma if scale == "vqlog" else 0.0)


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


def test_mrstft_golden():
    """Transform-level golden parity for the multi-resolution STFT scale —
    the last first-class scale family without one (reference
    fscale.py:195-226, transforms.py:44-48). Its 5-segment Q table yields
    sllen ~226k whose prime factorization exceeds the mixed-radix matmul
    plan's limit, exercising the native rfft/irfft fallback
    (ops/slicqt.py _plan_slice_fft) and the legacy scatter-as-gather
    synthesis assembly — neither is covered by the other golden configs."""
    if not reference_available():
        pytest.skip("reference checkout not available")
    import torch

    import_reference()
    from xumx_slicq_v2.nsgt import NSGT_sliced

    t = SliCQT(scale="mrstft", fbins=576, fmin=1.0)
    assert t.nfreqs == 577  # 4x128 + 64 segments + nyquist
    # the ~226k sllen has a >512 non-smooth factor: the mixed-radix DFT
    # matmul plan must have fallen back to native FFTs + legacy assembly
    assert t._ct is None and t._v2_idx is None

    ref = NSGT_sliced(
        _ref_scale(t), t.sllen, t.trlen, 44100.0,
        real=True, multichannel=True, device="cpu",
    )
    x = _rand_signal(length=int(1.1 * 44100), seed=11)
    ref_C = ref.forward((torch.from_numpy(x),))
    mine_C = t.forward(jnp.asarray(x[None]))
    assert len(ref_C) == len(mine_C)
    for rc, mc in zip(ref_C, mine_C):
        rc = rc.numpy()  # (S, C, F, M)
        mc = np.transpose(np.asarray(mc)[0], (2, 0, 1, 3))
        assert mc.shape == rc.shape
        # atol 1e-4: the ~226k-length f32 FFT accumulates ~5e-7 RELATIVE
        # roundoff on coefficients of magnitude ~100 (measured max abs err
        # 3.05e-5 on block 1) — a looser absolute tolerance than the short
        # smooth-length configs above, same relative accuracy
        np.testing.assert_allclose(mc, rc, atol=1e-4)

    # backward golden on the reference's own coefficients + roundtrip parity
    L = x.shape[-1]
    ref_y = ref.backward([c.clone() for c in ref_C], L).numpy()
    my_y = np.asarray(t.backward(mine_C, L))[0]
    np.testing.assert_allclose(my_y, ref_y, atol=2e-5)
    ref_err = np.abs(ref_y - x).max()
    my_err = np.abs(my_y - x).max()
    assert abs(my_err - ref_err) < 1e-4


def test_bf16_synth_staging_close_to_f32():
    """synth_staging='bf16' (split re/im bf16 planes through the synthesis
    assembly, f32 overlap accumulation) must track the f32 path within bf16
    quantization bounds — the inference-only fast path for the HBM-bound
    assembly stages (PERFORMANCE.md roofline)."""
    t32 = SliCQT(scale="mel", fbins=16, fmin=300.0)
    tb = SliCQT(scale="mel", fbins=16, fmin=300.0, synth_staging="bf16")
    assert tb._v2_idx is not None  # staging only applies to the fused path
    x = jnp.asarray(_rand_signal(length=22050, seed=7)[None] * 0.3)
    C = t32.forward(x)
    y32 = np.asarray(t32.backward(C, 22050))
    yb = np.asarray(tb.backward(C, 22050))
    rel = np.abs(yb - y32).max() / np.abs(y32).max()
    assert rel < 5e-3, rel  # measured ~1.5e-3 (bf16 has an 8-bit mantissa)
    # and the bf16 roundtrip is still a faithful inverse at audio scale
    assert np.abs(yb - np.asarray(x)).max() < 2e-2

    with pytest.raises(ValueError):
        SliCQT(scale="mel", fbins=16, fmin=300.0, synth_staging="f16")


def test_split_gather_matches_dense():
    """synth_split_gather=True (width-2 main assembly gather + static
    overflow scatter-add, _build_split_gather) must reproduce the dense
    (rows, O) gather to f32 reduction order: same summands per row, only
    the overflow rows' accumulation is regrouped ((e0+e1)+(e2+e3)). The
    split halves the dominant gather stage's read elements (52% at the
    canonical geometry — PERFORMANCE.md bytes audit: ~49% of dense reads
    hit the zero sentinel)."""
    cfg = dict(scale="mel", fbins=16, fmin=300.0)
    td = SliCQT(**cfg, synth_split_gather=False)
    ts = SliCQT(**cfg, synth_split_gather=True)
    assert ts._v5_main is not None and ts._v5_main[0].shape[1] == 2
    assert ts._v5_ov is not None  # this config does overflow
    x = jnp.asarray(_rand_signal(length=22050, seed=11)[None] * 0.3)
    C = td.forward(x)
    yd = np.asarray(td.backward(C, 22050))
    ys = np.asarray(ts.backward(C, 22050))
    np.testing.assert_allclose(ys, yd, atol=2e-6 * max(1.0, np.abs(yd).max()))


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
