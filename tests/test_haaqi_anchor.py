"""HAAQI anchoring tests (VERDICT r1 item 9).

clarity.evaluator.haaqi is unavailable offline, so exact parity can't be
checked; instead the re-implementation is anchored against (a) the
published combination model's worked values, (b) monotonicity invariants,
and (c) the reference's published 700-pair CAD1 score distribution
(.github/cadenza-results/scores.csv: per-stem scores ~0.08-0.29, pair
means in [0.152, 0.289], mean 0.205).
"""

import numpy as np
import pytest

from cadenza.haaqi import (
    FS_MODEL,
    _erb_bw,
    _erb_center_freqs,
    combination_model,
    env_smooth,
    gammatone_env_bm,
    haaqi_v1,
    melcor9,
    spect_diff,
)

CFS = [250, 500, 1000, 2000, 4000, 6000]
NORMAL = [0, 0, 0, 0, 0, 0]
# typical CAD1 listener: moderate sloping loss
MODERATE = [25, 30, 35, 45, 55, 60]

FS = 24000


def _music(seed=0, seconds=3.0, f0=196.0):
    """Synthetic music-like stem: harmonics + amplitude envelope + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 2 * np.pi)) / (k + 1)
              for k in range(6))
    env = 0.5 * (1.0 + np.sin(2 * np.pi * 2.5 * t + rng.uniform(0, 2 * np.pi)))
    return (sig * env + 0.01 * rng.standard_normal(len(t))).astype(np.float64)


def test_combination_model_worked_values():
    """Perfect features give the published near-1 value; zero gives 0."""
    assert combination_model(1.0, 1.0, 1.0, 1.0) == pytest.approx(0.999, abs=1e-9)
    assert combination_model(0.0, 0.0, 0.0, 0.0) == 0.0
    # nonlinear term dominates (0.754 weight on cep_high^3): killing the
    # cepstral correlation must cost far more than killing the linear term
    no_cep = combination_model(0.0, 1.0, 1.0, 1.0)
    no_lin = combination_model(1.0, 1.0, 0.0, 0.0)
    assert no_cep < no_lin


# ---------------------------------------------------------------------------
# per-stage anchors against published worked values (VERDICT r2 item 8)
# ---------------------------------------------------------------------------


def test_erb_bandwidths_match_glasberg_moore():
    """Stage anchor: auditory filter bandwidths must equal the published
    Glasberg & Moore (1990) ERB values ERB(f) = 24.7(4.37 f/kHz + 1):
    51.7 Hz @ 250 Hz, 132.6 Hz @ 1 kHz, 456.5 Hz @ 4 kHz."""
    assert _erb_bw(250.0) == pytest.approx(51.68, abs=0.05)
    assert _erb_bw(1000.0) == pytest.approx(132.64, abs=0.05)
    assert _erb_bw(4000.0) == pytest.approx(456.46, abs=0.05)
    # 32 bands span 80..8000 Hz, uniformly spaced on the ERB-rate scale
    cfs = _erb_center_freqs()
    assert len(cfs) == 32
    assert cfs[0] == pytest.approx(80.0, rel=1e-6)
    assert cfs[-1] == pytest.approx(8000.0, rel=1e-6)
    erb_rate = 21.4 * np.log10(4.37 * cfs / 1000.0 + 1.0)
    steps = np.diff(erb_rate)
    np.testing.assert_allclose(steps, steps[0], rtol=1e-3)


def test_gammatone_filter_equivalent_rectangular_bandwidth():
    """Stage anchor: the IMPLEMENTED gammatone band's measured equivalent
    rectangular bandwidth (integral of |H|^2 over peak |H|^2 of its impulse
    response) must equal Glasberg-Moore ERB(cf) — the definition the 1.019
    bandwidth constant (Patterson's 4th-order gammatone) is fitted to.
    Measured deviation of this implementation: <0.2% at 250/1000/4000 Hz."""
    fs = FS_MODEL
    n = int(fs)
    imp = np.zeros(n)
    imp[0] = 1.0
    for cf in (250.0, 1000.0, 4000.0):
        _, bm = gammatone_env_bm(imp, cf, 1.0)
        P = np.abs(np.fft.rfft(bm)) ** 2
        erb_measured = P.sum() * (fs / n) / P.max()
        assert erb_measured == pytest.approx(_erb_bw(cf), rel=0.01), cf
    # hearing-loss broadening scales the measured bandwidth by bw_factor
    _, bm2 = gammatone_env_bm(imp, 1000.0, 2.0)
    P2 = np.abs(np.fft.rfft(bm2)) ** 2
    erb2 = P2.sum() * (fs / n) / P2.max()
    assert erb2 == pytest.approx(2.0 * _erb_bw(1000.0), rel=0.02)


def test_env_smooth_is_normalized():
    """Stage anchor: the 8 ms Hann segment average is unit-normalized — a
    constant 40 dB envelope must come out exactly 40 dB in every segment."""
    env = np.full((3, int(0.5 * FS_MODEL)), 40.0)
    seg = env_smooth(env)
    assert seg.shape[0] == 3 and seg.shape[1] > 8
    np.testing.assert_allclose(seg, 40.0, atol=1e-9)


def test_melcor9_perfect_and_independent():
    """Stage anchor: identical modulated envelopes give cepstral-modulation
    correlations ~1 in every band (ave == low == high == 1); independent
    noise envelopes must land far lower."""
    rng = np.random.default_rng(0)
    nseg = 400
    base = 30.0 + 10.0 * rng.standard_normal((32, nseg)).cumsum(1) / np.sqrt(np.arange(1, nseg + 1))
    ave, low, high = melcor9(base, base.copy())
    assert ave == pytest.approx(1.0, abs=1e-6)
    assert low == pytest.approx(1.0, abs=1e-6)
    assert high == pytest.approx(1.0, abs=1e-6)
    other = 30.0 + 10.0 * rng.standard_normal((32, nseg)).cumsum(1) / np.sqrt(np.arange(1, nseg + 1))
    ave2, _, _ = melcor9(base, other)
    assert ave2 < 0.6


def test_spect_diff_identity_values():
    """Stage anchor: identical long-term spectra -> (d_loud, d_slope) ==
    (1, 1); a large loudness redistribution drives d_loud toward 0."""
    rng = np.random.default_rng(1)
    seg = 30.0 + 5.0 * rng.standard_normal((32, 50))
    d_loud, d_slope = spect_diff(seg, seg.copy())
    assert d_loud == pytest.approx(1.0, abs=1e-9)
    assert d_slope == pytest.approx(1.0, abs=1e-9)
    flipped = seg[::-1]  # spectral tilt reversal
    d_loud2, d_slope2 = spect_diff(seg, flipped)
    assert d_loud2 < d_loud and d_slope2 < 0.5


def test_combination_model_published_coefficients():
    """Stage anchor: the Kates & Arehart (2016) fit — NL = 0.754 c^3 +
    0.246 s, L = 0.329 dL + 0.671 dS, Q = 0.336 NL + 0.001 L + 0.501 NL^2
    + 0.161 L^2 — checked at an interior worked point, computed here
    independently digit-for-digit."""
    c, s, dl, ds = 0.5, 0.5, 0.5, 0.5
    nl = 0.754 * 0.125 + 0.246 * 0.5          # 0.21725
    lin = 0.329 * 0.5 + 0.671 * 0.5           # 0.5
    expect = 0.336 * nl + 0.001 * lin + 0.501 * nl ** 2 + 0.161 * lin ** 2
    assert combination_model(c, s, dl, ds) == pytest.approx(expect, abs=1e-12)
    assert expect == pytest.approx(0.13737, abs=5e-4)


def test_monotonic_under_increasing_noise():
    """Scores must decrease strictly as additive noise grows (for both
    normal and impaired listeners). Per the CAD1 protocol the processed
    signal carries the listener's NAL-R prescription (equalisation=1);
    an unamplified signal under an impaired audiogram is out-of-protocol
    and sits at the score floor where ordering is noise."""
    from cadenza.haaqi import _nalr_equalize

    sig = _music(0)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(sig))
    sig_rms = np.sqrt(np.mean(sig ** 2))
    for audiogram in (NORMAL, MODERATE):
        scores = []
        for snr_db in (30.0, 10.0, 0.0, -10.0):
            n_rms = sig_rms / 10 ** (snr_db / 20.0)
            proc = sig + noise / np.sqrt(np.mean(noise ** 2)) * n_rms
            proc = _nalr_equalize(proc, audiogram, CFS, fs=FS)
            scores.append(haaqi_v1(sig, FS, proc, FS, audiogram))
        assert all(0.0 <= s <= 1.0 for s in scores)
        assert all(a > b for a, b in zip(scores, scores[1:])), (audiogram, scores)


def test_separation_like_degradation_in_published_support():
    """A separation-style estimate (stem + bleed from other stems) scored
    under a CAD1-style impaired audiogram must land inside (a loose
    envelope of) the published per-stem score support [~0.08, 0.29] —
    a silent bug in the gammatone/melcor stages would push it to ~0 or ~1."""
    stem = _music(0, f0=196.0)
    bleed = _music(7, f0=277.18) + _music(11, f0=110.0)
    bleed *= np.sqrt(np.mean(stem ** 2)) / np.sqrt(np.mean(bleed ** 2))
    est = 0.8 * stem + 0.45 * bleed  # ~5 dB SDR-ish estimate
    score = haaqi_v1(stem, FS, est, FS, MODERATE)
    assert 0.02 <= score <= 0.65, f"separation-like score {score:.3f} outside plausible support"
    # and a *good* estimate must beat it
    good = haaqi_v1(stem, FS, 0.95 * stem + 0.05 * bleed, FS, MODERATE)
    assert good > score


def test_hearing_loss_does_not_raise_identity_score():
    """Identity under impairment can't beat identity under normal hearing."""
    sig = _music(3)
    s_normal = haaqi_v1(sig, FS, sig, FS, NORMAL)
    s_impaired = haaqi_v1(sig, FS, sig, FS, MODERATE)
    assert s_normal > 0.85
    assert s_impaired <= s_normal + 1e-6


def test_melcor9_short_input_returns_zero_instead_of_crashing():
    """8..15 active segments used to crash sosfiltfilt (default padlen 15
    for the 2nd-order bandpass sections); the guard must return zeros."""
    rng = np.random.default_rng(0)
    for nseg in (7, 8, 12, 15):
        seg = 30.0 + rng.standard_normal((32, nseg))
        assert melcor9(seg, seg.copy()) == (0.0, 0.0, 0.0)
    # 16 segments is the first length that actually filters
    seg = 30.0 + rng.standard_normal((32, 16))
    ave, low, high = melcor9(seg, seg.copy())
    assert ave == pytest.approx(1.0, abs=1e-6)


def test_ideal_hearing_aid_scores_at_identity_ceiling():
    """The HAAQI convention (Kates & Arehart 2016): BOTH signals pass
    through the impaired ear, and with equalisation=1 the reference is
    NAL-R-amplified internally. An ideal hearing aid — processed equal to
    the NAL-R'd reference — must therefore score at the identity ceiling
    for an impaired listener, while the unaided signal scores far lower.
    (The pre-fix model ran the reference through a NORMAL ear, which made
    this ceiling unreachable under hearing loss.)"""
    from cadenza.haaqi import _nalr_equalize

    sig = _music(0)
    ideal = _nalr_equalize(sig, MODERATE, CFS, fs=FS)
    s_ideal = haaqi_v1(sig, FS, ideal, FS, MODERATE)
    s_unaided = haaqi_v1(sig, FS, sig, FS, MODERATE)
    assert s_ideal > 0.95
    assert s_unaided < s_ideal - 0.3


# ---------------------------------------------------------------------------
# brute-force cross-checks of the feature math (VERDICT r3 item 8): an
# independent, loop-everything re-derivation straight from the paper
# equations — shares no code with cadenza/haaqi.py — run against it on
# random envelopes. Catches consistent in-support scale/indexing bugs the
# anchors above can't.
# ---------------------------------------------------------------------------


def _melcor9_brute(ref_seg, proc_seg, threshold=2.5, segment_ms=8.0):
    """Kates & Arehart (2016) mel-cepstral modulation correlation, scalar
    loops only: (1) drop segments whose across-band max reference level is
    at/below threshold; (2) project band envelopes (per-segment mean
    removed) onto half-cosine bases j=1..6; (3) bandpass each cepstral
    trajectory into the 8 modulation bands with a zero-phase 2nd-order
    butterworth; (4) normalized absolute cross-correlation per basis, mean
    over bases per band; return (mean all 8, mean bands 1-4, mean 5-8)."""
    import math

    import scipy.signal

    nbands, nseg_all = ref_seg.shape
    if nseg_all < 16:
        return 0.0, 0.0, 0.0
    active = [i for i in range(nseg_all) if max(ref_seg[b][i] for b in range(nbands)) > threshold]
    if len(active) < 16:
        return 0.0, 0.0, 0.0
    r = np.array([[ref_seg[b][i] for i in active] for b in range(nbands)])
    p = np.array([[proc_seg[b][i] for i in active] for b in range(nbands)])
    nseg = len(active)
    for i in range(nseg):  # remove the per-segment across-band mean
        r[:, i] = r[:, i] - sum(r[b, i] for b in range(nbands)) / nbands
        p[:, i] = p[:, i] - sum(p[b, i] for b in range(nbands)) / nbands
    rc, pc = [], []
    for j in range(1, 7):
        basis = [math.cos(b * math.pi * j / (nbands - 1)) for b in range(nbands)]
        rc.append([sum(basis[b] * r[b, i] for b in range(nbands)) for i in range(nseg)])
        pc.append([sum(basis[b] * p[b, i] for b in range(nbands)) for i in range(nseg)])
    seg_rate = 1000.0 / (segment_ms / 2.0)
    edges = [0, 4, 8, 12.5, 20, 32, 50, 80, 125]
    band_means = []
    for b in range(8):
        lo, hi = edges[b], min(edges[b + 1], seg_rate / 2 * 0.99)
        if hi <= lo:
            band_means.append(0.0)
            continue
        sos = scipy.signal.butter(
            2, [max(lo, 1e-2) / (seg_rate / 2), hi / (seg_rate / 2)], "bandpass", output="sos"
        )
        cors = []
        for j in range(6):
            a = scipy.signal.sosfiltfilt(sos, np.asarray(rc[j]))
            c = scipy.signal.sosfiltfilt(sos, np.asarray(pc[j]))
            num = abs(sum(a[i] * c[i] for i in range(nseg)))
            den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in c))
            cors.append(0.0 if den == 0 else num / den)
        band_means.append(sum(cors) / 6)
    return (
        sum(band_means) / 8,
        sum(band_means[:4]) / 4,
        sum(band_means[4:]) / 4,
    )


def _bm_covary_brute(ref_bm, proc_bm, segment_ms=16.0, fs=FS_MODEL):
    """Windowed BM-vibration cross-covariance, scalar loops only: Hann-
    windowed 50%-overlap segments, per-band normalized |cross-covariance|,
    averaged over each band's louder half of segments (by windowed
    reference norm), then averaged over bands with the 0.5..1.0 linear
    band weighting."""
    import math

    seg = int(round(segment_ms * 0.001 * fs))
    hop = seg // 2
    nbands, n = ref_bm.shape
    nseg = max((n - seg) // hop + 1, 1)
    win = np.hanning(seg)
    sync = []
    for k in range(nbands):
        covs, levels = [], []
        for i in range(nseg):
            r = [ref_bm[k][i * hop + t] * win[t] for t in range(seg)]
            p = [proc_bm[k][i * hop + t] * win[t] for t in range(seg)]
            rm, pm = sum(r) / seg, sum(p) / seg
            r = [x - rm for x in r]
            p = [x - pm for x in p]
            nr = math.sqrt(sum(x * x for x in r))
            npp = math.sqrt(sum(x * x for x in p))
            covs.append(0.0 if nr * npp <= 0 else abs(sum(r[t] * p[t] for t in range(seg))) / (nr * npp))
            levels.append(nr)
        order = sorted(range(nseg), key=lambda i: levels[i], reverse=True)
        keep = order[: max(nseg // 2, 1)]
        sync.append(sum(covs[i] for i in keep) / len(keep))
    w = [0.5 + 0.5 * k / (nbands - 1) for k in range(nbands)]
    val = sum(sync[k] * w[k] for k in range(nbands)) / sum(w)
    return min(max(val, 0.0), 1.0)


def test_melcor9_matches_brute_force():
    from cadenza.haaqi import melcor9 as fast

    rng = np.random.default_rng(7)
    for trial in range(3):
        nseg = int(rng.integers(40, 120))
        # random envelopes with structure: band-correlated slow modulation
        # + noise, and a few silent segments to exercise the threshold gate
        base = 25.0 + 10.0 * np.sin(
            2 * np.pi * rng.uniform(1, 6) * np.arange(nseg) / nseg
        )
        ref = base + 3.0 * rng.standard_normal((32, nseg))
        proc = ref + rng.uniform(0.5, 4.0) * rng.standard_normal((32, nseg))
        silent = rng.choice(nseg, size=nseg // 8, replace=False)
        ref[:, silent] = 0.0
        got = fast(ref, proc)
        want = _melcor9_brute(ref, proc)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_bm_covary_matches_brute_force():
    from cadenza.haaqi import bm_covary as fast

    rng = np.random.default_rng(8)
    n = int(0.4 * FS_MODEL)
    t = np.arange(n) / FS_MODEL
    # band-limited tone-ish BM signals with varying per-segment level
    ref = np.stack([
        np.sin(2 * np.pi * rng.uniform(100, 4000) * t) * (0.2 + rng.uniform(0, 1))
        + 0.05 * rng.standard_normal(n)
        for _ in range(32)
    ])
    proc = ref + 0.3 * rng.standard_normal(ref.shape)
    got = fast(ref, proc)
    want = _bm_covary_brute(ref, proc)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_gammatone_filterbank_anchors():
    """Ear-model filterbank wedge (the remaining validation-scope caveat):
    the heterodyne one-pole-cascade gammatone must realize the PUBLISHED
    auditory filter spec, checked against first principles rather than
    shared code.

    (a) Equivalent rectangular bandwidth: a 4-pole cascade at 3-dB factor
        b has two-sided noise bandwidth b*(5pi/16)/(pi/2) ... measured
        empirically here as sum|H|^2*df / max|H|^2 of the impulse
        response spectrum. Kates' 1.019 factor is designed so this equals
        ERB(cf) = 24.7*(4.37*cf/1000 + 1) (Glasberg & Moore), scaled by
        the OHC bandwidth-broadening factor.
    (b) The response peaks at cf.
    (c) A pure tone at cf passes with unit envelope gain.
    """
    from cadenza.haaqi import gammatone_env_bm, _erb_bw

    fs = FS_MODEL
    n = int(1.0 * fs)
    imp = np.zeros(n)
    imp[0] = 1.0
    for cf, bw_factor in [(250.0, 1.0), (1000.0, 1.0), (4000.0, 1.0), (1000.0, 2.2)]:
        _, bm = gammatone_env_bm(imp, cf, bw_factor, fs=fs)
        H2 = np.abs(np.fft.rfft(bm)) ** 2
        freqs = np.fft.rfftfreq(n, 1.0 / fs)
        df = freqs[1] - freqs[0]
        erb_measured = H2.sum() * df / H2.max()
        erb_expected = bw_factor * _erb_bw(cf)
        # the 1.019 factor compensates the 4-pole cascade's 0.982 noise-
        # bandwidth ratio; agreement should be ~1e-3, assert 3%
        np.testing.assert_allclose(erb_measured, erb_expected, rtol=0.03)
        f_peak = freqs[np.argmax(H2)]
        assert abs(f_peak - cf) <= 2 * df, (cf, f_peak)

        t = np.arange(n) / fs
        env, _ = gammatone_env_bm(0.37 * np.sin(2 * np.pi * cf * t), cf, bw_factor, fs=fs)
        steady = env[n // 2:]
        np.testing.assert_allclose(steady.mean(), 0.37, rtol=0.02)


def test_compression_io_slope_anchors():
    """Ear-model compression anchor: the loudness mapping's dB-in/dB-out
    slope must be 1/CR with the PUBLISHED compression-ratio ramp — CR
    grows from 1.25 in the lowest band to 3.5 in the highest (Kates 2013
    auditory-model framework; reference consumes it via
    clarity.evaluator.haaqi, cadenza/evaluate.py:128-276) — OHC loss must
    move CR toward linear by the (1 - OHC/80) rule while attenuating the
    output, and sub-threshold output must clamp at 0 dB SL.

    Probe: a pure tone at a band's cf passes its gammatone filter at unit
    envelope gain (test_gammatone_filterbank_anchors), and the middle-ear
    / filter gains are level-independent, so raising `level1` by 10 dB
    raises the band's input envelope by exactly 10 dB — the steady-state
    output rise measures the compression slope directly."""
    from cadenza.haaqi import NUM_BANDS, ear_model

    cfs = _erb_center_freqs()

    def steady_env_db(k, level1, hl):
        t = np.arange(int(0.4 * FS_MODEL)) / FS_MODEL
        tone = np.sin(2 * np.pi * cfs[k] * t)
        ref_db, _, _, _, _ = ear_model(
            tone, tone, hl, level1=level1, fs_in=FS_MODEL, equalisation=0
        )
        n = ref_db.shape[1]
        return np.median(ref_db[k, n // 2: -n // 8])

    # (a) normal ear: slope == 1/CR at the published ramp's interior and
    # both endpoints (1.25 low band, 3.5 high band)
    for k in (0, NUM_BANDS // 2, NUM_BANDS - 1):
        cr = 1.25 + 2.25 * k / (NUM_BANDS - 1)
        lo, hi = steady_env_db(k, 60.0, NORMAL), steady_env_db(k, 70.0, NORMAL)
        assert lo > 1.0, (k, lo)  # above the 0 dB SL clamp: slope is valid
        assert (hi - lo) / 10.0 == pytest.approx(1.0 / cr, abs=0.01), k

    # (b) flat 60 dB HL: OHC = min(0.8*60, 70*0.6+10) = 48 dB, so
    # CR' = 1 + (CR-1)*(1 - 48/80) — closer to linear — and the output
    # drops (OHC attenuation before, IHC shift after the compression)
    k = NUM_BANDS // 2
    cr = 1.25 + 2.25 * k / (NUM_BANDS - 1)
    cr_imp = 1.0 + (cr - 1.0) * (1.0 - 48.0 / 80.0)
    hl60 = [60, 60, 60, 60, 60, 60]
    # probe louder than the normal-ear case: the 48 dB OHC attenuation and
    # 12 dB IHC threshold shift put a 60 dB tone below 0 dB SL
    lo, hi = steady_env_db(k, 80.0, hl60), steady_env_db(k, 90.0, hl60)
    assert lo > 1.0, lo
    assert (hi - lo) / 10.0 == pytest.approx(1.0 / cr_imp, abs=0.01)
    assert 1.0 / cr_imp > 1.0 / cr  # loss linearizes the I/O function
    assert lo < steady_env_db(k, 80.0, NORMAL)  # and attenuates

    # (c) a sub-threshold tone under that loss clamps at 0 dB SL
    assert steady_env_db(k, 5.0, hl60) == 0.0


def test_haaqi_end_to_end_pinned_regression():
    """End-to-end regression anchor (VERDICT r4 directive 8): a fixed
    synthetic (reference, processed, audiogram) tuple with its current
    score pinned to 6 decimals, so future edits to the ear model cannot
    silently shift the scale in ways the brute-force feature cross-checks
    (melcor9 / bm_covary / gammatone / compression-slope anchors above)
    don't cover. The pinned values are THIS implementation's outputs —
    a regression pin, not a clarity-parity claim (clarity is unavailable
    offline; validation scope documented in cadenza/haaqi.py)."""
    import scipy.signal as ss

    from cadenza.haaqi import haaqi_v1

    rng = np.random.default_rng(12345)
    t = np.arange(int(3.0 * FS)) / FS
    ref = sum(np.sin(2 * np.pi * 196.0 * (k + 1) * t + 0.7 * k) / (k + 1)
              for k in range(6))
    ref *= 0.5 * (1.0 + np.sin(2 * np.pi * 2.5 * t))
    ref += 0.001 * rng.standard_normal(len(t))
    ref = (0.3 * ref / np.abs(ref).max()).astype(np.float64)
    # fixed degradation: gain + 3 kHz lowpass + additive noise
    b, a = ss.butter(2, 3000 / (FS / 2))
    proc = 0.9 * ss.lfilter(b, a, ref) + 0.003 * rng.standard_normal(len(t))

    score_normal = haaqi_v1(ref, FS, proc, FS, np.array(NORMAL, float))
    score_moderate = haaqi_v1(ref, FS, proc, FS, np.array(MODERATE, float))
    np.testing.assert_allclose(score_normal, 0.172757319, atol=1e-6)
    np.testing.assert_allclose(score_moderate, 0.170773842, atol=1e-6)
