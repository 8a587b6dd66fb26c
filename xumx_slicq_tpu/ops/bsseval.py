"""BSS-eval v4 metrics (SDR/ISR/SIR/SAR) -- museval-compatible, from scratch.

The reference evaluates with museval.eval_mus_track (evaluation.py:36),
which implements BSS Eval v4 (Stoter et al., SiSEC 2018): time-invariant
512-tap least-squares distortion filters computed over the WHOLE track,
framewise energy ratios over 1 s windows, median aggregation. museval is a
CPU-hours hot spot for the reference (README.md:235: 2-3 h for 50 tracks);
here the heavy pieces (length-2^k FFT correlations and the
(nsrc*nchan*L)^2 Gram solve) can run on the TPU via JAX.

Decomposition of an estimate e for target j (bss_eval images):
    s_true  = reference image s_j
    e_spat  = P_j(e) - s_j       (projection onto delayed copies of s_j)
    e_interf= P_all(e) - P_j(e)  (projection onto all references)
    e_artif = e - P_all(e)
Framewise ratios (per 1 s window w):
    SDR = 10log10 ||s_true||^2 / ||e_spat+e_interf+e_artif||^2
    ISR = 10log10 ||s_true||^2 / ||e_spat||^2
    SIR = 10log10 ||s_true+e_spat||^2 / ||e_interf||^2
    SAR = 10log10 ||s_true+e_spat+e_interf||^2 / ||e_artif||^2
Aggregation: median over windows per track (museval EvalStore), median over
tracks per target.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

METRICS = ["SDR", "ISR", "SIR", "SAR"]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# Blocked (overlap-save) path: the whole-track filters only need lags
# |tau| < flen, so instead of one 2^ceil(log2(N))-point FFT per signal
# (2^24 for a full MUSDB track: the reference's museval spends CPU-hours
# here, README.md:235) the correlations/convolutions accumulate over
# short blocks with batched _BLK_NFFT-point FFTs. Exact — not an
# approximation: every product pair lands in an unaliased region.
_BLK_NFFT = 8192


def _rfft(x, n, use_jax, axis=-1):
    if use_jax:
        import jax.numpy as jnp

        return jnp.fft.rfft(x, n, axis=axis)
    import scipy.fft as sfft  # ~5x np.fft on this host

    return sfft.rfft(x, n, axis=axis)


def _irfft(x, n, use_jax):
    if use_jax:
        import jax.numpy as jnp

        return np.asarray(jnp.fft.irfft(x, n))
    import scipy.fft as sfft

    return sfft.irfft(x, n)


class _BlockedBss:
    """Fused blocked-FFT engine for one track's whole-track filters.

    The three forward FFT banks — reference a-blocks, reference b-blocks,
    estimate b-blocks — are computed ONCE and shared by the Gram /
    cross-correlation stage and all filter applications (P_all plus the
    per-source projections), which as standalone calls would each redo
    them. a-blocks (K, nb, Lb) tile the signal; b-block i is the
    nfft-long sliding window starting at sample i*Lb (a-block i plus the
    head of block i+1, a zero-cost strided view of one padded copy), so
    sum_i <a_i, b_i[.+lam]> is exactly the full-signal correlation at
    lags 0..flen-1: a-blocks are zero-padded Lb -> nfft by the FFT, so
    no product wraps for lam < flen."""

    def __init__(self, R: np.ndarray, E: np.ndarray, flen: int, use_jax: bool):
        K, N = R.shape
        self.flen, self.use_jax, self.N = flen, use_jax, N
        self.nfft = nfft = _BLK_NFFT
        self.Lb = Lb = nfft - flen
        self.nb = -(-N // Lb)
        pR = self._pad(R)  # one padded copy shared by the a-view and b-view
        a_R = pR[:, : self.nb * Lb].reshape(K, self.nb, Lb)
        self.FA = _rfft(a_R, nfft, use_jax)              # (K, nb, F)
        self.FBr = _rfft(self._bview(pR), nfft, use_jax)
        self.FBe = _rfft(self._bview(self._pad(E)), nfft, use_jax)

    def _pad(self, x):
        out = np.zeros((x.shape[0], self.nb * self.Lb + self.flen), np.float64)
        out[:, : x.shape[1]] = x
        if self.use_jax:
            import jax.numpy as jnp

            return jnp.asarray(out)
        return out

    def _bview(self, p):
        if self.use_jax:
            import jax.numpy as jnp

            # slices/concat instead of a (nb, nfft) gather-index constant
            # (b-block i = a-block i ++ head of block i+1; last head = margin)
            a = p[:, : self.nb * self.Lb].reshape(p.shape[0], self.nb, self.Lb)
            heads = jnp.concatenate(
                [a[:, 1:, : self.flen], p[:, self.nb * self.Lb:][:, None, :]],
                axis=1,
            )
            return jnp.concatenate([a, heads], axis=-1)
        s0, s1 = p.strides
        return np.lib.stride_tricks.as_strided(
            p, (p.shape[0], self.nb, self.nfft), (s0, self.Lb * s1, s1),
            writeable=False,
        )

    def _einsum(self, spec, a, b):
        if self.use_jax:
            import jax.numpy as jnp

            return jnp.einsum(spec, a, b)
        return np.einsum(spec, a, b, optimize=True)

    def _conj(self, x):
        if self.use_jax:
            import jax.numpy as jnp

            return jnp.conj(x)
        return np.conj(x)

    def correlations(self):
        """(G, D) with the same contract as `_correlations`."""
        K, flen, nfft = self.FA.shape[0], self.flen, self.nfft
        CA = self._conj(self.FA)
        Srr = self._einsum("knf,lnf->klf", CA, self.FBr)
        Sre = self._einsum("knf,lnf->klf", CA, self.FBe)
        # positive lags 0..flen-1: r_rr[k,l,lam] = sum_n R[k,n] R[l,n+lam]
        r_rr = np.asarray(_irfft(Srr, nfft, self.use_jax))[..., :flen]
        r_re = np.asarray(_irfft(Sre, nfft, self.use_jax))[..., :flen]
        # full lag axis -(flen-1)..flen-1 via r[k,l,-lam] = r[l,k,lam]
        full = np.concatenate(
            [r_rr.transpose(1, 0, 2)[..., 1:][..., ::-1], r_rr], axis=-1
        )                                                # (K, K, 2*flen-1)
        lags = np.arange(flen)
        lag_mat = lags[:, None] - lags[None, :] + (flen - 1)
        G = full[:, :, lag_mat]                          # (K, K, flen, flen)
        G = G.transpose(0, 2, 1, 3).reshape(K * flen, K * flen)
        D = r_re.transpose(0, 2, 1).reshape(K * flen, -1)
        return G, D

    def apply(self, coeffs: np.ndarray, rows=slice(None)):
        """Filter-and-sum over the `rows`-selected reference channels,
        reusing their cached a-block FFTs: coeffs (k*flen, E) -> (E, N)."""
        FA = self.FA[rows]
        k = FA.shape[0]
        E = coeffs.shape[1]
        flen, nfft, Lb, nb = self.flen, self.nfft, self.Lb, self.nb
        c = coeffs.reshape(k, flen, E)
        if self.use_jax:
            import jax.numpy as jnp

            c = jnp.asarray(c)
        FC = _rfft(c, nfft, self.use_jax, axis=1)        # (k, F, E)
        Y = self._einsum("knf,kfe->enf", FA, FC)
        y = np.asarray(_irfft(Y, nfft, self.use_jax))    # (E, nb, nfft)
        # overlap-add: block i's tail [Lb, Lb+flen-1) lands at (i+1)*Lb;
        # the last block's tail falls past nb*Lb >= N and is dropped.
        out = y[..., :Lb].reshape(E, nb * Lb)            # fresh array (copy)
        out[:, Lb:].reshape(E, nb - 1, Lb)[..., : flen - 1] += \
            y[:, :-1, Lb: Lb + flen - 1]
        return out[:, : self.N]


def _correlations(refs: np.ndarray, ests: np.ndarray, flen: int, use_jax: bool):
    """FFT cross-correlations.

    refs: (K, N) flattened (src*chan) references
    ests: (E, N) flattened estimate channels
    Returns (G, D):
      G[(k,tau),(k2,tau2)] = sum_n refs[k, n-tau] refs[k2, n-tau2]
      D[(k,tau), e]        = sum_n refs[k, n-tau] ests[e, n]
    """
    K, N = refs.shape
    # full-FFT engine only: the blocked overlap-save path for long tracks is
    # owned by the single gate in bss_eval_images (which also needs the
    # _BlockedBss plan for the filter applications)
    n2 = _next_pow2(N + flen - 1)
    if use_jax:
        import jax.numpy as jnp

        rf = jnp.fft.rfft(jnp.asarray(refs), n2)
        ef = jnp.fft.rfft(jnp.asarray(ests), n2)
        # cross-spectra; lag range -(flen-1)..(flen-1)
        cross_rr = jnp.fft.irfft(rf[:, None].conj() * rf[None, :], n2)  # (K,K,n2)
        cross_re = jnp.fft.irfft(rf[:, None].conj() * ef[None, :], n2)  # (K,E,n2)
        cross_rr = np.asarray(cross_rr)
        cross_re = np.asarray(cross_re)
    else:
        rf = np.fft.rfft(refs, n2)
        ef = np.fft.rfft(ests, n2)
        cross_rr = np.fft.irfft(rf[:, None].conj() * rf[None, :], n2)
        cross_re = np.fft.irfft(rf[:, None].conj() * ef[None, :], n2)

    # G[(k,tau),(k2,tau2)] = <s_k[.-tau], s_k2[.-tau2]> = r_{k,k2}[tau - tau2]
    lags = np.arange(flen)
    lag_mat = (lags[:, None] - lags[None, :]) % n2           # (flen, flen): tau - tau2
    G = cross_rr[:, :, lag_mat]                              # (K,K,flen,flen)
    G = G.transpose(0, 2, 1, 3).reshape(K * flen, K * flen)
    # D[(k,tau), e] = sum_n refs[k, n-tau] ests[e, n] = cross_re[k, e, tau]
    D = cross_re[:, :, :flen]                                # (K,E,flen)
    D = D.transpose(0, 2, 1).reshape(K * flen, -1)
    return G, D


def _apply_filters(refs: np.ndarray, coeffs: np.ndarray, flen: int, N: int, use_jax: bool):
    """Filter-and-sum: coeffs (K*flen, E) applied to refs (K, N) -> (E, N)."""
    K = refs.shape[0]
    E = coeffs.shape[1]
    n2 = _next_pow2(N + flen - 1)
    c = coeffs.reshape(K, flen, E)
    if use_jax:
        import jax.numpy as jnp

        rf = jnp.fft.rfft(jnp.asarray(refs), n2)             # (K, F)
        cf = jnp.fft.rfft(jnp.asarray(c), n2, axis=1)        # (K, F, E)
        out = jnp.fft.irfft(jnp.einsum("kf,kfe->ef", rf, cf), n2)[:, :N]
        return np.asarray(out)
    rf = np.fft.rfft(refs, n2)
    cf = np.fft.rfft(c, n2, axis=1)
    out = np.fft.irfft(np.einsum("kf,kfe->ef", rf, cf), n2)[:, :N]
    return out


def _solve(G: np.ndarray, D: np.ndarray, use_jax: bool) -> np.ndarray:
    reg = 1e-10 * np.trace(G) / G.shape[0] if G.shape[0] else 0.0
    A = G + reg * np.eye(G.shape[0])
    if use_jax:
        import jax.numpy as jnp
        import jax.scipy.linalg as jsl

        return np.asarray(jsl.solve(jnp.asarray(A), jnp.asarray(D), assume_a="pos"))
    import scipy.linalg as sl

    return sl.solve(A, D, assume_a="pos")


def bss_eval_images(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    window: int = 44100,
    hop: int = 44100,
    filters_len: int = 512,
    use_jax: bool = False,
):
    """BSS-eval v4 with whole-track filters + framewise ratios.

    reference_sources/estimated_sources: (nsrc, nsampl, nchan).
    Returns dict of metric -> (nsrc, nwin) arrays."""
    refs = np.asarray(reference_sources, np.float64)
    ests = np.asarray(estimated_sources, np.float64)
    nsrc, N, nchan = refs.shape
    flen = filters_len

    R = refs.transpose(0, 2, 1).reshape(nsrc * nchan, N)     # (K, N)
    E = ests.transpose(0, 2, 1).reshape(nsrc * nchan, N)

    plan = None
    if N > _BLK_NFFT and flen <= _BLK_NFFT // 4:
        plan = _BlockedBss(R, E, flen, use_jax)
        G, D = plan.correlations()
    else:
        G, D = _correlations(R, E, flen, use_jax)

    def apply(coeffs, rows=slice(None)):
        if plan is not None:
            return plan.apply(coeffs, rows)
        return _apply_filters(R[rows], coeffs, flen, N, use_jax)

    # projection onto ALL references, for every estimate channel
    C_all = _solve(G, D, use_jax)                            # (K*flen, nsrc*nchan)
    P_all = apply(C_all)                                     # (nsrc*nchan, N)

    # projection of estimate j onto reference j only
    P_self = np.zeros_like(E)
    for j in range(nsrc):
        rows = slice(j * nchan * flen, (j + 1) * nchan * flen)
        cols = slice(j * nchan, (j + 1) * nchan)
        Gj = G[rows, rows]
        Dj = D[rows, cols]
        Cj = _solve(Gj, Dj, use_jax)                          # (nchan*flen, nchan)
        P_self[cols] = apply(Cj, cols)

    # decompositions per source (nsrc, nchan, N); the error components
    # telescope, so each energy operand is a single difference (or a
    # projection directly): dist = e - s_true, ts = s_true + e_spat =
    # p_self, tsi = s_true + e_spat + e_interf = p_all.
    s_true = refs.transpose(0, 2, 1)
    p_self = P_self.reshape(nsrc, nchan, N)
    p_all = P_all.reshape(nsrc, nchan, N)
    e_est = E.reshape(nsrc, nchan, N)

    # framewise energy ratios
    nwin = max((N - window) // hop + 1, 1)

    def frame_energy(x):
        # (nsrc, nchan, N) -> (nsrc, nwin) summed over chan+win
        if hop == window and nwin * window <= N:
            xw = x[..., : nwin * window].reshape(nsrc, nchan, nwin, window)
            return np.einsum("scwt,scwt->sw", xw, xw)
        out = np.empty((nsrc, nwin))
        for w in range(nwin):
            seg = x[..., w * hop: w * hop + window]
            out[:, w] = np.sum(seg ** 2, axis=(1, 2))
        return out

    eps = np.finfo(np.float64).eps
    Es_true = frame_energy(s_true)
    Es_spat = frame_energy(p_self - s_true)
    Es_interf = frame_energy(p_all - p_self)
    Es_artif = frame_energy(e_est - p_all)
    Es_dist = frame_energy(e_est - s_true)
    Es_ts = frame_energy(p_self)
    Es_tsi = frame_energy(p_all)

    def db(num, den):
        return 10.0 * np.log10((num + eps) / (den + eps))

    return {
        "SDR": db(Es_true, Es_dist),
        "ISR": db(Es_true, Es_spat),
        "SIR": db(Es_ts, Es_interf),
        "SAR": db(Es_tsi, Es_artif),
    }


# ---------------------------------------------------------------------------
# fully device-resident engine
# ---------------------------------------------------------------------------


class DeviceBssEval:
    """BSS-eval v4 as ONE jitted XLA program per shape bucket — the TPU-native
    evaluation fast path.

    The museval-style host engine (the reference's CPU-hours hot spot,
    README.md:235) leaves the chip idle while a 1-core host grinds FFT
    correlations and the 4096x4096 Gram solve. Here the whole blocked
    overlap-save pipeline — FFT banks, Gram/cross correlations, Cholesky
    solves, filter applications, framewise energies — runs on-device in
    f32 (dots pinned HIGHEST = f32-accurate); only seven (nsrc, nwin)
    energy arrays come back to the host, where the dB ratios are formed in
    float64. Estimates produced by the Separator never leave the chip.

    Numerics: f32 end-to-end (TPU has no f64). The Gram ridge is raised to
    1e-7*trace/n (vs the host engine's 1e-10) so the Cholesky stays PD in
    f32; measured agreement with the float64 host engine is ~0.01 dB on
    separation-like estimates (test_bsseval.py::test_device_engine_matches_host).
    Non-finite scores (pathological conditioning) are the caller's cue to
    fall back to the host engine.

    Shape bucketing: signals are zero-padded so the block count nb rounds
    up to `nb_round` — exact, not approximate (zero samples contribute
    nothing to correlations, and windows past the true length are sliced
    off after the fetch) — so a 50-track run compiles only a handful of
    executables, amortized further by the persistent compilation cache.
    """

    def __init__(self, window: int = 44100, hop: int = 44100,
                 filters_len: int = 512, nb_round: int = 128):
        if hop != window:
            raise NotImplementedError("device engine assumes hop == window (museval v4 default)")
        self.window, self.hop, self.flen = window, hop, filters_len
        self.nfft = _BLK_NFFT
        self.Lb = self.nfft - filters_len
        self.nb_round = nb_round
        # one engine is shared across the N evaluation worker threads
        # (evaluation.py run_parallel_evaluation), so the jit-object cache
        # must be race-free: without the lock two threads can miss the same
        # key and each build + trace + compile its own executable for it.
        # One jit object per (K, nb, nchan) is correct for multi-device use
        # too — jax.jit's own cache compiles one executable per input
        # sharding/device, which is the intended one-compile-per-
        # (shape-bucket, device).
        import threading

        self._cores = {}
        self._lock = threading.Lock()
        self.trace_counts: Dict[tuple, int] = {}  # (K, nb, nchan) -> #traces (diagnostic)

    # -- jitted core ---------------------------------------------------------

    def _core(self, K: int, nb: int, nchan: int):
        import jax
        import jax.numpy as jnp

        key = (K, nb, nchan)
        with self._lock:
            if key in self._cores:
                return self._cores[key]
            return self._build_core(key, K, nb, nchan)

    def _build_core(self, key, K: int, nb: int, nchan: int):
        # called with self._lock held; closure construction is microseconds
        # (tracing/compilation happen lazily at the first call of the jitted fn)
        import jax
        import jax.numpy as jnp

        flen, nfft, Lb, window = self.flen, self.nfft, self.Lb, self.window
        Npad = nb * Lb
        # clips shorter than one window get a single partial window
        # (museval semantics: nwin = max((N-window)//hop+1, 1))
        nwin_all = max(Npad // window, 1)
        nsrc = K // nchan
        lags = np.arange(flen)
        lag_mat = lags[:, None] - lags[None, :] + (flen - 1)      # (flen, flen)
        HI = jax.lax.Precision.HIGHEST

        def ein(spec, a, b):
            return jnp.einsum(spec, a, b, precision=HI)

        def solve_pos(G, D):
            reg = 1e-7 * (jnp.trace(G) / G.shape[0])
            A = G + reg * jnp.eye(G.shape[0], dtype=G.dtype)
            L = jnp.linalg.cholesky(A)
            y = jax.scipy.linalg.solve_triangular(L, D, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        def apply_filters(FA, coeffs, k):
            """coeffs (k*flen, E) filtered-and-summed over FA's k signals."""
            E = coeffs.shape[1]
            c = coeffs.reshape(k, flen, E)
            FC = jnp.fft.rfft(c, nfft, axis=1)                    # (k, F, E)
            Y = ein("knf,kfe->enf", FA, FC)
            y = jnp.fft.irfft(Y, nfft)                            # (E, nb, nfft)
            main = y[..., :Lb].reshape(E, Npad)
            tail = y[..., Lb: Lb + flen - 1]                      # (E, nb, flen-1)
            tail = jnp.pad(tail, ((0, 0), (0, 0), (0, Lb - flen + 1))).reshape(E, Npad)
            return main + jnp.pad(tail, ((0, 0), (Lb, 0)))[:, :Npad]

        def frame_energy(x):
            win_n = min(nwin_all * window, Npad)
            xw = x[..., :win_n]
            if win_n < nwin_all * window:     # single partial window
                xw = jnp.pad(xw, ((0, 0), (0, 0), (0, nwin_all * window - win_n)))
            xw = xw.reshape(nsrc, nchan, nwin_all, window)
            return ein("scwt,scwt->sw", xw, xw)

        def core(R, E_, n_true):
            """R/E_: (K, Npad + flen) f32 zero-padded signals (b-view margin
            included); n_true: true sample count (dynamic scalar) — the
            projections ring out flen-1 samples past it and must not leak
            into a partial window. Returns 7 (nsrc, nwin_all) f32 energy
            arrays."""
            # traced-time side effect: counts (re)traces of this bucket —
            # jit re-traces once per input sharding/device (intentional);
            # anything beyond #devices indicates a wasted compile
            self.trace_counts[key] = self.trace_counts.get(key, 0) + 1

            def bview(p, a):
                # b-block i = a-block i ++ first flen samples of block i+1
                # (last head = the flen-sample margin). Pure slices/concat:
                # the former (nb, nfft) int64 gather table cost ~90-150 MB
                # of baked index constants per compiled shape bucket.
                heads = jnp.concatenate(
                    [a[:, 1:, :flen], p[:, Npad: Npad + flen][:, None, :]], axis=1
                )
                return jnp.concatenate([a, heads], axis=-1)       # (K, nb, nfft)

            aR = R[:, :Npad].reshape(K, nb, Lb)
            aE = E_[:, :Npad].reshape(K, nb, Lb)
            FA = jnp.fft.rfft(aR, nfft)                           # (K, nb, F)
            FBr = jnp.fft.rfft(bview(R, aR), nfft)
            FBe = jnp.fft.rfft(bview(E_, aE), nfft)
            CA = jnp.conj(FA)
            r_rr = jnp.fft.irfft(ein("knf,lnf->klf", CA, FBr), nfft)[..., :flen]
            r_re = jnp.fft.irfft(ein("knf,lnf->klf", CA, FBe), nfft)[..., :flen]
            full = jnp.concatenate(
                [r_rr.transpose(1, 0, 2)[..., 1:][..., ::-1], r_rr], axis=-1
            )
            G = full[:, :, lag_mat].transpose(0, 2, 1, 3).reshape(K * flen, K * flen)
            D = r_re.transpose(0, 2, 1).reshape(K * flen, K)

            valid = (jnp.arange(Npad) < n_true).astype(jnp.float32)
            P_all = apply_filters(FA, solve_pos(G, D), K) * valid  # (K, Npad)

            blocks = []
            for j in range(nsrc):
                rows = slice(j * nchan * flen, (j + 1) * nchan * flen)
                cols = slice(j * nchan, (j + 1) * nchan)
                Cj = solve_pos(G[rows, rows], D[rows, cols])
                blocks.append(apply_filters(FA[j * nchan:(j + 1) * nchan], Cj, nchan))
            P_self = jnp.concatenate(blocks, axis=0) * valid       # (K, Npad)

            s_true = R[:, :Npad].reshape(nsrc, nchan, Npad)
            e_est = E_[:, :Npad].reshape(nsrc, nchan, Npad)
            p_self = P_self.reshape(nsrc, nchan, Npad)
            p_all = P_all.reshape(nsrc, nchan, Npad)
            return (
                frame_energy(s_true),
                frame_energy(p_self - s_true),
                frame_energy(p_all - p_self),
                frame_energy(e_est - p_all),
                frame_energy(e_est - s_true),
                frame_energy(p_self),
                frame_energy(p_all),
            )

        fn = jax.jit(core)
        self._cores[key] = fn  # lock held by _core
        return fn

    # -- host-facing API -----------------------------------------------------

    def __call__(self, reference_sources, estimated_sources):
        """reference_sources/estimated_sources: (nsrc, nsampl, nchan), numpy
        or device arrays, float or raw PCM ints (ints are normalized by the
        wav full-scale on device — lossless staging for PCM sources at a
        fraction of the transfer bytes; unsupported dtypes raise, matching
        the host loader). Returns dict metric -> (nsrc, nwin) float64,
        museval semantics."""
        import jax.numpy as jnp

        from ..data import apply_pcm_scale

        def flatten(x):
            x = apply_pcm_scale(x, jnp)  # validates dtype before jnp.asarray
            nsrc, N, nchan = x.shape
            return x.transpose(0, 2, 1).reshape(nsrc * nchan, N), N, nchan

        R, N, nchan = flatten(reference_sources)
        E, Ne, _ = flatten(estimated_sources)
        n = min(N, Ne)
        R, E = R[:, :n], E[:, :n]
        K = R.shape[0]
        nb = -(-n // self.Lb)
        # bucket the block count: multiples of nb_round for long tracks,
        # next power of two for short ones (a 30 s clip must not zero-pad
        # to a full-track executable)
        nb = (-(-nb // self.nb_round) * self.nb_round
              if nb >= self.nb_round else _next_pow2(nb))
        pad = nb * self.Lb + self.flen - n
        R = jnp.pad(R, ((0, 0), (0, pad)))
        E = jnp.pad(E, ((0, 0), (0, pad)))

        energies = self._core(K, nb, nchan)(R, E, n)
        nwin = max((n - self.window) // self.hop + 1, 1)
        (Es_true, Es_spat, Es_interf, Es_artif,
         Es_dist, Es_ts, Es_tsi) = (np.asarray(e, np.float64)[:, :nwin] for e in energies)

        eps = np.finfo(np.float64).eps

        def db(num, den):
            return 10.0 * np.log10((num + eps) / (den + eps))

        return {
            "SDR": db(Es_true, Es_dist),
            "ISR": db(Es_true, Es_spat),
            "SIR": db(Es_ts, Es_interf),
            "SAR": db(Es_tsi, Es_artif),
        }


def fast_sdr(track_estimate: np.ndarray, track_reference: np.ndarray, eps: float = 1e-10) -> float:
    """Simple energy-ratio SDR (reference slicqfinder.py:20-40): the cheap
    metric used for sliCQT param search, not BSS-eval."""
    num = np.sum(track_reference ** 2)
    den = np.sum((track_reference - track_estimate) ** 2)
    return float(10.0 * np.log10((num + eps) / (den + eps)))


# ---------------------------------------------------------------------------
# museval-style aggregation
# ---------------------------------------------------------------------------


@dataclass
class TrackScores:
    name: str
    targets: Dict[str, Dict[str, np.ndarray]]  # target -> metric -> (nwin,)

    def median_scores(self) -> Dict[str, Dict[str, float]]:
        return {
            t: {m: float(np.nanmedian(v)) for m, v in ms.items()}
            for t, ms in self.targets.items()
        }

    def __str__(self):
        lines = [self.name]
        for t, ms in self.median_scores().items():
            vals = "  ".join(f"{m}:{v:7.3f}" for m, v in ms.items())
            lines.append(f"  {t:8s} ==> {vals}")
        return "\n".join(lines)


@dataclass
class EvalStore:
    """Median-over-windows then median-over-tracks aggregation
    (museval.EvalStore semantics used at evaluation.py:105-118)."""

    tracks: List[TrackScores] = field(default_factory=list)

    def add_track(self, track: TrackScores):
        self.tracks.append(track)

    def agg_frames_tracks_scores(self) -> Dict[str, Dict[str, float]]:
        if not self.tracks:
            return {}
        targets = self.tracks[0].targets.keys()
        out = {}
        for t in targets:
            out[t] = {}
            for m in METRICS:
                per_track = [np.nanmedian(tr.targets[t][m]) for tr in self.tracks]
                out[t][m] = float(np.nanmedian(per_track))
        return out

    def total_sdr(self) -> float:
        agg = self.agg_frames_tracks_scores()
        return float(np.mean([v["SDR"] for v in agg.values()]))

    def __str__(self):
        agg = self.agg_frames_tracks_scores()
        lines = ["Aggregated Scores (median over frames, median over tracks)"]
        for t, ms in agg.items():
            vals = "  ".join(f"{m}:{v:7.3f}" for m, v in ms.items())
            lines.append(f"{t:8s} ==> {vals}")
        if agg:
            lines.append(f"total SDR: {self.total_sdr():.3f} dB")
        return "\n".join(lines)


def eval_track(
    references: Dict[str, np.ndarray],
    estimates: Dict[str, np.ndarray],
    track_name: str = "",
    window: int = 44100,
    hop: int = 44100,
    use_jax: bool = False,
) -> TrackScores:
    """Evaluate one track. references/estimates: {target: (nsampl, nchan)}."""
    targets = list(references.keys())
    refs = np.stack([references[t] for t in targets])
    ests = np.stack([estimates[t] for t in targets])
    # mono refs vs stereo estimates (a mono source tree: the separator
    # repeats the mixture to stereo, references stay 1-channel): broadcast
    # the mono side so both flatten to the same src*chan row count
    if refs.shape[2] == 1 and ests.shape[2] > 1:
        refs = np.repeat(refs, ests.shape[2], axis=2)
    elif ests.shape[2] == 1 and refs.shape[2] > 1:
        ests = np.repeat(ests, refs.shape[2], axis=2)
    n = min(refs.shape[1], ests.shape[1])
    refs, ests = refs[:, :n], ests[:, :n]
    scores = bss_eval_images(refs, ests, window=window, hop=hop, use_jax=use_jax)
    return TrackScores(
        name=track_name,
        targets={t: {m: scores[m][i] for m in METRICS} for i, t in enumerate(targets)},
    )


def eval_track_device(
    references,
    estimates,
    engine: DeviceBssEval,
    track_name: str = "",
) -> TrackScores:
    """Device-resident eval_track: references/estimates {target: (nsampl,
    nchan)} numpy/device/int16 arrays. Falls back to the float64 host
    engine if the f32 Cholesky produced non-finite scores."""
    targets = list(references.keys())
    import jax.numpy as jnp

    from ..data import apply_pcm_scale, pcm_scale_info

    # validate dtypes BEFORE jnp.stack: jax would silently canonicalize
    # int64 to int32 and the engine would then apply the wrong full-scale
    for v in list(references.values()) + list(estimates.values()):
        pcm_scale_info(np.dtype(v.dtype))
    refs = jnp.stack([jnp.asarray(references[t]) for t in targets])
    ests = jnp.stack([jnp.asarray(estimates[t]) for t in targets])
    # broadcast a mono side to match (same convention as eval_track); the
    # repeat runs on-device so staged bytes stay halved for mono sources
    if refs.shape[2] == 1 and ests.shape[2] > 1:
        refs = jnp.repeat(refs, ests.shape[2], axis=2)
    elif ests.shape[2] == 1 and refs.shape[2] > 1:
        ests = jnp.repeat(ests, refs.shape[2], axis=2)
    scores = engine(refs, ests)
    if not all(np.all(np.isfinite(v)) for v in scores.values()):
        # single device fetch per array, then the shared PCM normalization
        refs_h = {t: apply_pcm_scale(references[t], np) for t in targets}
        ests_h = {t: apply_pcm_scale(ests[i], np) for i, t in enumerate(targets)}
        return eval_track(refs_h, ests_h, track_name=track_name)
    return TrackScores(
        name=track_name,
        targets={t: {m: scores[m][i] for m in METRICS} for i, t in enumerate(targets)},
    )
