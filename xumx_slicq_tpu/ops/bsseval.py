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


def _correlations(refs: np.ndarray, ests: np.ndarray, flen: int, use_jax: bool):
    """FFT cross-correlations.

    refs: (K, N) flattened (src*chan) references
    ests: (E, N) flattened estimate channels
    Returns (G, D):
      G[(k,tau),(k2,tau2)] = sum_n refs[k, n-tau] refs[k2, n-tau2]
      D[(k,tau), e]        = sum_n refs[k, n-tau] ests[e, n]
    """
    K, N = refs.shape
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

    G, D = _correlations(R, E, flen, use_jax)

    # projection onto ALL references, for every estimate channel
    C_all = _solve(G, D, use_jax)                            # (K*flen, nsrc*nchan)
    P_all = _apply_filters(R, C_all, flen, N, use_jax)       # (nsrc*nchan, N)

    # projection of estimate j onto reference j only
    P_self = np.zeros_like(E)
    for j in range(nsrc):
        rows = slice(j * nchan * flen, (j + 1) * nchan * flen)
        cols = slice(j * nchan, (j + 1) * nchan)
        Gj = G[rows, rows]
        Dj = D[rows, cols]
        Cj = _solve(Gj, Dj, use_jax)                          # (nchan*flen, nchan)
        P_self[cols] = _apply_filters(R[cols], Cj, flen, N, use_jax)

    # decompositions per source (nsrc, nchan, N)
    s_true = refs.transpose(0, 2, 1)
    p_self = P_self.reshape(nsrc, nchan, N)
    p_all = P_all.reshape(nsrc, nchan, N)
    e_est = E.reshape(nsrc, nchan, N)
    e_spat = p_self - s_true
    e_interf = p_all - p_self
    e_artif = e_est - p_all

    # framewise energy ratios
    nwin = max((N - window) // hop + 1, 1)

    def frame_energy(x):
        # (nsrc, nchan, N) -> (nsrc, nwin) summed over chan+win
        out = np.empty((nsrc, nwin))
        for w in range(nwin):
            seg = x[..., w * hop: w * hop + window]
            out[:, w] = np.sum(seg ** 2, axis=(1, 2))
        return out

    eps = np.finfo(np.float64).eps
    Es_true = frame_energy(s_true)
    Es_spat = frame_energy(e_spat)
    Es_interf = frame_energy(e_interf)
    Es_artif = frame_energy(e_artif)
    Es_dist = frame_energy(e_spat + e_interf + e_artif)
    Es_ts = frame_energy(s_true + e_spat)
    Es_tsi = frame_energy(s_true + e_spat + e_interf)

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
    n = min(refs.shape[1], ests.shape[1])
    refs, ests = refs[:, :n], ests[:, :n]
    scores = bss_eval_images(refs, ests, window=window, hop=hop, use_jax=use_jax)
    return TrackScores(
        name=track_name,
        targets={t: {m: scores[m][i] for m in METRICS} for i, t in enumerate(targets)},
    )
