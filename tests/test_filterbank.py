"""Golden-parity tests: scales + filterbank design vs the reference (torch CPU)."""

import numpy as np
import pytest

from xumx_slicq_tpu.ops import fscale as F
from xumx_slicq_tpu.ops import filterbank as FB

from conftest import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

CANONICAL = dict(scale="bark", fbins=262, fmin=32.9, fmax=22050.0, fs=44100.0)

SCALE_CASES = [
    ("bark", 262, 32.9),
    ("bark", 50, 20.0),
    ("mel", 128, 30.0),
    ("cqlog", 99, 40.0),
    ("vqlog", 70, 25.0),
    ("linear", 64, 50.0),
    ("mrstft", 0, 0.0),  # fbins/fmin ignored: fixed 5-segment multi-resolution table
]


def _ref_scale(name, fbins, fmin, fmax=22050.0, fgamma=15.0):
    import_reference()
    from xumx_slicq_v2.nsgt.fscale import BarkScale, MelScale, LogScale, LinScale, MRSTFTScale

    if name == "bark":
        return BarkScale(fmin, fmax, fbins)
    if name == "mel":
        return MelScale(fmin, fmax, fbins)
    if name == "cqlog":
        return LogScale(fmin, fmax, fbins)
    if name == "vqlog":
        return LogScale(fmin, fmax, fbins, gamma=fgamma)
    if name == "linear":
        return LinScale(fmin, fmax, fbins)
    if name == "mrstft":
        return MRSTFTScale()
    raise ValueError(name)


@pytest.mark.parametrize("name,fbins,fmin", SCALE_CASES)
def test_scale_parity(name, fbins, fmin):
    ours = F.make_scale(name, fbins, fmin)
    ref = _ref_scale(name, fbins, fmin)

    f_ours, q_ours = ours()
    f_ref, q_ref = ref()
    np.testing.assert_allclose(f_ours, f_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(q_ours, q_ref.numpy(), rtol=1e-5)

    sll_ours, trl_ours = ours.suggested_sllen_trlen(44100.0)
    sll_ref, trl_ref = ref.suggested_sllen_trlen(44100.0)
    assert (sll_ours, trl_ours) == (sll_ref, trl_ref)


def test_canonical_config_lengths():
    scl = F.make_scale("bark", 262, 32.9)
    sllen, trlen = scl.suggested_sllen_trlen(44100.0)
    # measured canonical values (SURVEY.md section 2.1)
    assert sllen == 18060
    assert trlen == 4516


@pytest.mark.parametrize("name,fbins,fmin", SCALE_CASES)
def test_filterbank_parity(name, fbins, fmin):
    import torch

    import_reference()
    from xumx_slicq_v2.nsgt.nsgfwin_sl import nsgfwin as ref_nsgfwin
    from xumx_slicq_v2.nsgt.util import calcwinrange as ref_calcwinrange, nsdual as ref_nsdual

    scl = F.make_scale(name, fbins, fmin)
    sllen, trlen = scl.suggested_sllen_trlen(44100.0)
    plan = FB.design_filterbank(scl, sllen, trlen, 44100.0, min_win=16)

    ref_scl = _ref_scale(name, fbins, fmin)
    rf, rq = ref_scl()
    g_ref, rfbas_ref, M_ref = ref_nsgfwin(
        rf, rq, 44100.0, sllen, sliced=True, min_win=16, Qvar=1, dowarn=False
    )
    wins_ref, nn_ref = ref_calcwinrange(g_ref, rfbas_ref, sllen)
    gd_ref = ref_nsdual(g_ref, wins_ref, nn_ref, torch.as_tensor(M_ref))

    assert plan.nn == nn_ref
    np.testing.assert_array_equal(plan.M, np.asarray(M_ref))
    np.testing.assert_array_equal(plan.rfbas, np.asarray(rfbas_ref))
    assert len(plan.g) == len(g_ref)
    for ours_g, ref_gi in zip(plan.g, g_ref):
        np.testing.assert_allclose(ours_g, ref_gi.numpy(), atol=1e-6)
    for ours_w, ref_w in zip(plan.wins, wins_ref):
        np.testing.assert_array_equal(ours_w, ref_w.numpy())
    for ours_gd, ref_gd in zip(plan.gd, gd_ref):
        # atol covers near-zero dual-window tails where fp32 (torch) vs
        # fp64-then-cast (ours) accumulation differs at the 1e-7 level
        # (observed on mrstft's 404-tap duals)
        np.testing.assert_allclose(
            ours_gd, ref_gd.numpy().astype(np.float32), rtol=3e-5, atol=1e-7
        )


def test_canonical_bucket_table():
    scl = F.make_scale("bark", 262, 32.9)
    plan = FB.design_filterbank(scl, 18060, 4516, 44100.0, min_win=16)
    assert plan.nfreqs == 263
    assert plan.ncoefs == 292
    # 70 ragged blocks measured by executing the reference (SURVEY.md 2.1)
    assert len(plan.buckets) == 70
    assert sum(b.f_count for b in plan.buckets) == 263
    assert plan.buckets[0].M == 28 and plan.buckets[0].f_count == 1
    assert plan.buckets[1].M == 16 and plan.buckets[1].f_count == 86
    assert plan.buckets[-1].M == 292
