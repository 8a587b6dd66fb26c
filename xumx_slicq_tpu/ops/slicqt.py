"""TPU-native sliced Constant-Q Transform (sliCQT / sliced NSGT).

Design
------
The reference implementation (sevagh/xumx-sliCQ-V2, nsgt/) computes the
transform with Python generators (slicing.py:21-72, unslicing.py:33-69), a
Python loop over ~263 frequency bins with per-bin tensor gathers
(nsgtf.py:50-63), and a per-bin scatter-add synthesis loop (nsigtf.py:53-97).
None of that maps to XLA. Here the whole transform is re-derived as a static
compute graph:

* **Slicing** -> one reshape + one (S,4) block gather + a window multiply.
  The reference's even/odd quarter rotation becomes a static permutation
  table indexed by slice parity.
* **Analysis** -> one batched rFFT per slice, then per *bucket* (a run of
  contiguous bins sharing one time resolution M) a single precomputed gather
  (with Hermitian-mirror sign baked in), a window multiply, a phase-ramp
  multiply (which realizes both the fftshift-style coefficient roll of
  nsgtf.py:55-63 and the `arrange` slice-parity rotation of slicq.py:13-33
  *in the frequency domain*), and one batched iFFT.
* **Synthesis** -> per bucket one batched FFT + phase ramp, then the per-bin
  overlap-add scatter (nsigtf.py:88-95, including the conjugate-symmetric
  mirror reconstruction of nsigtf.py:63-80) is converted at plan time into a
  dense *gather* table: every output spectrum position knows which (<= O)
  weighted coefficient-spectrum entries feed it. Scatter-add (TPU-hostile)
  becomes gather+sum (TPU-friendly).
* **Unslicing** -> static quarter un-rotation + two shifted adds.

Everything is static-shape and jit/vmap/pjit-compatible; the plan (index
tables, windows, ramps) is built once on the host in NumPy.

The canonical config (bark, 262 bins, 32.9 Hz, fs=44100) yields sllen=18060,
trlen=4516, 263 reduced bins in 70 buckets; round-trip error ~1e-6 (fp32),
matching the reference's measured ~3e-7 (fp64 windows).
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .fscale import make_scale
from .filterbank import FilterbankPlan, design_filterbank, hannwin

# Transform DFT matmuls run at bf16x3 (Precision.HIGH): XLA's TPU default
# lowers f32 dots to SINGLE-PASS bf16 (measured canonical roundtrip 4.2e-2
# on-device), HIGH recovers ~1e-6 roundtrip at 3 passes; HIGHEST (6 passes)
# measured +25% whole-pipeline time for no audible gain. Learned model
# convs keep the fast default (comparable to the reference's TF32 path).
_PREC = jax.lax.Precision.HIGH


# ---------------------------------------------------------------------------
# plan-time table construction (NumPy, host)
# ---------------------------------------------------------------------------


def _make_slice_window(sl_len: int, tr_area: int) -> np.ndarray:
    """Tukey-like slice window from two half-Hanns
    (reference: nsgt/slicing.py:7-18)."""
    hhop = sl_len // 4
    htr = tr_area // 2
    w = hannwin(2 * tr_area)
    tw = np.zeros(sl_len, dtype=np.float64)
    tw[: hhop - htr] = 0
    tw[hhop - htr: hhop + htr] = w[tr_area:]
    tw[hhop + htr: 3 * hhop - htr] = 1
    tw[3 * hhop - htr: 3 * hhop + htr] = w[:tr_area]
    tw[3 * hhop + htr:] = 0
    return tw.astype(np.float32)


# The reference places temporal quarter i of slice k at physical position
# (i + 3 - 2k) % 4 (slicing.py:53-58) -- a circular shift by (3-2k)%4
# quarters. Internally slices stay in temporal order; the shift is realized
# as per-parity spectral phases baked into the analysis/synthesis weights.


@dataclass(frozen=True)
class _BucketTables:
    """Static per-bucket tables (NumPy; become XLA constants)."""

    f_start: int
    f_count: int
    M: int
    # forward: contiguous slices from the extended full spectrum
    starts: np.ndarray       # (F,) int32: slice start into ft_ext
    fwd_w: np.ndarray        # (2, F, M) complex64 fused analysis weights
    inv_ramp: np.ndarray     # (2, M) complex64 synthesis arrange ramp
    w_pos: np.ndarray        # (F, M) float32: gd * M synthesis weights
    dft_inv: np.ndarray      # (M, M) complex64 iDFT matrix (analysis)
    dft_fwd: np.ndarray      # (M, M) complex64 DFT matrix (synthesis)
    # mirror (negative-frequency) reconstruction for bins 1..nfreqs-2
    neg_lo: int              # first local bin index with a mirror
    neg_hi: int              # one-past-last local bin index with a mirror
    w_neg: Optional[np.ndarray]  # (neg_hi-neg_lo, M) float32 or None


class SliCQT:
    """Sliced NSGT over a fixed filterbank plan.

    Forward maps a waveform batch (B, C, L) to a list of per-bucket complex
    coefficient tensors shaped (B, C, F_b, S, M_b); backward inverts back to
    (B, C, length). Both are pure traceable JAX functions (jit/vmap/grad
    compatible); plan tables are embedded as constants.

    Parity contract with the reference: coefficients match NSGT_sliced
    (real=True, reducedform=0, multichannel=True) including the `arrange`
    slice-parity rotation, so tensors are interchangeable block-by-block.
    """

    def __init__(
        self,
        scale: str = "bark",
        fbins: int = 262,
        fmin: float = 32.9,
        fmax: float = 22050.0,
        fgamma: float = 15.0,
        fs: float = 44100.0,
        sllen: Optional[int] = None,
        trlen: Optional[int] = None,
        min_win: int = 16,
        synth_staging: str = "f32",
        synth_split_gather: bool = True,
    ):
        self.scale_name = scale
        self.fbins = fbins
        self.fmin = fmin
        self.fmax = fmax
        self.fgamma = fgamma
        self.fs = fs
        # "bf16": stage the synthesis assembly value buffer V as split re/im
        # bfloat16 planes (the pad+concat and gather traffic that dominates
        # synthesis HBM bytes, PERFORMANCE.md roofline) and accumulate the
        # overlap sum in f32. Halves the bytes of the dominant stages for a
        # bounded accuracy cost (~bf16's 2^-8 relative per summand). Only
        # the fused (_v2_idx) assembly honors it; goldens use the default.
        if synth_staging not in ("f32", "bf16"):
            raise ValueError(f"synth_staging must be 'f32' or 'bf16', got {synth_staging!r}")
        self.synth_staging = synth_staging
        # split-gather assembly: the dense (rows, O) gather reads the zero
        # sentinel for ~49% of its entries at the canonical geometry (mean
        # real entries/row 2.05, O=4 — PERFORMANCE.md bytes audit). The
        # split variant gathers only the first 2 entries per row densely
        # and adds the few hundred rows with 3-4 entries via a static
        # sorted-unique scatter-add, halving the dominant gather stage's
        # read traffic. Same summands per row (order regrouped for the
        # overflow rows only: (e0+e1)+(e2+e3) vs serial), so results agree
        # to f32 reduction order. DEFAULT since the round-5 on-chip A/B:
        # 0.1310 vs 0.1399 s/track steady-state offline (-6.4%), runs
        # 0.1310/0.1312/0.1315 — PERFORMANCE.md round-5 split-gather
        # section; synth_split_gather=False keeps the dense path.
        self.synth_split_gather = bool(synth_split_gather)

        scl = make_scale(scale, fbins, fmin, fmax, fgamma)
        if sllen is None:
            sllen, trlen = scl.suggested_sllen_trlen(fs)
        self.sllen = int(sllen)
        self.trlen = int(trlen)
        self.plan: FilterbankPlan = design_filterbank(scl, self.sllen, self.trlen, fs, min_win=min_win)

        self.hhop = self.sllen // 4
        self.nn = self.plan.nn
        self.nh = self.nn // 2 + 1
        self.nfreqs = self.plan.nfreqs
        self.ncoefs = self.plan.ncoefs

        self._slice_window = _make_slice_window(self.sllen, self.trlen)  # (sllen,)
        self._build_bucket_tables()
        self._build_inverse_gather()

    # -- table construction -------------------------------------------------

    def _build_bucket_tables(self):
        plan = self.plan
        nn = self.nn
        hhop = self.hhop
        tables: List[_BucketTables] = []
        # slice-rotation phases: internally slices are kept in TEMPORAL
        # order; the reference's rotated physical layout (slicing.py:53-58)
        # is a circular shift by (3-2k)%4 quarters, equivalent to a
        # per-parity spectral phase exp(-2i pi f shift / nn) folded into the
        # analysis weights below (shift = 3*hhop even slices, hhop odd).
        for b in plan.buckets:
            M = b.M
            l2 = M // 2
            rolled = (np.arange(M) + l2) % M  # coefficient roll (nsgtf.py:55-63)
            k = np.arange(M)
            r_even, r_odd = 3 * M // 4, M // 4
            # analysis arrange ramp (slicq.py arrange fwd): ifft(T * e^{+2i pi k r/M})
            fwd_ramp = np.stack([
                np.exp(2j * np.pi * k * r_even / M),
                np.exp(2j * np.pi * k * r_odd / M),
            ])
            starts_list, w_list, wpos_list = [], [], []
            for j in range(b.f_start, b.f_start + b.f_count):
                g = plan.g[j]
                win = plan.wins[j]
                gs = np.fft.fftshift(g).astype(np.float64)
                base = int(win[0])
                starts_list.append(base)
                idx_full = win[rolled]          # absolute spectrum positions
                w = gs[rolled]
                # rotation phase per parity at each tap's spectrum position
                rot = np.stack([
                    np.exp(-2j * np.pi * idx_full * (3 * hhop) / nn),
                    np.exp(-2j * np.pi * idx_full * (1 * hhop) / nn),
                ])
                w_list.append(w[None, :] * fwd_ramp * rot)  # (2, M)
                wpos_list.append((plan.gd[j] * np.float32(M)).astype(np.float32))

            # synthesis arrange is the inverse roll (r swapped), folded into
            # the post-FFT spectrum: fft(roll(x, -r))[k] = fft(x)[k]*e^{2i pi k r/M}
            inv_ramp = np.stack([
                np.exp(2j * np.pi * k * r_odd / M),
                np.exp(2j * np.pi * k * r_even / M),
            ]).astype(np.complex64)

            # mirror eligibility: bins 1..nfreqs-2 get a negative-frequency
            # partner in synthesis (nsigtf.py:61)
            lo_bin = max(b.f_start, 1)
            hi_bin = min(b.f_start + b.f_count, self.nfreqs - 1)
            if hi_bin > lo_bin:
                wneg = np.stack([
                    (plan.gd[2 * (self.nfreqs - 1) - j] * np.float32(M)).astype(np.float32)
                    for j in range(lo_bin, hi_bin)
                ])
                neg_lo, neg_hi = lo_bin - b.f_start, hi_bin - b.f_start
            else:
                wneg, neg_lo, neg_hi = None, 0, 0

            # per-bucket (i)FFTs over the ragged sizes M (multiples of 4 with
            # arbitrary prime factors) are replaced by one shared DFT matmul
            # per bucket: exact, MXU-resident, and far fewer HLO ops.
            mn = np.outer(np.arange(M), np.arange(M))
            dft_inv = (np.exp(2j * np.pi * mn / M) / M).astype(np.complex64)
            dft_fwd = np.exp(-2j * np.pi * mn / M).astype(np.complex64)

            tables.append(_BucketTables(
                f_start=b.f_start,
                f_count=b.f_count,
                M=M,
                starts=np.asarray(starts_list, np.int32),
                fwd_w=np.stack(w_list).transpose(1, 0, 2).astype(np.complex64),
                inv_ramp=inv_ramp,
                w_pos=np.stack(wpos_list),
                dft_inv=dft_inv,
                dft_fwd=dft_fwd,
                neg_lo=neg_lo,
                neg_hi=neg_hi,
                w_neg=wneg,
            ))
        self.buckets = tables
        self.maxM = max(b.M for b in tables)
        # synthesis un-rotation: physical->temporal spectral phase per parity
        p = np.arange(self.nh)
        self._unrot = np.stack([
            np.exp(2j * np.pi * p * (3 * self.hhop) / nn),
            np.exp(2j * np.pi * p * (1 * self.hhop) / nn),
        ]).astype(np.complex64)
        self._plan_slice_fft()

    def _plan_slice_fft(self):
        """Mixed-radix plan for the length-nn slice (i)FFT.

        nn = sllen typically has large non-smooth prime factors (canonical
        18060 = 2^2*3*5*7*43), which XLA's TPU FFT handles badly (Bluestein)
        or not at all. Factor nn = smooth * rest with smooth containing only
        {2,3,5}: the smooth part runs as a native FFT, the rest as a DFT
        matmul on the MXU (Cooley-Tukey split, exact). Falls back to native
        rfft/irfft when `rest` is 1 or too large."""
        nn = self.nn
        smooth = 1
        rest = nn
        for p in (2, 3, 5):
            while rest % p == 0:
                smooth *= p
                rest //= p
        self._ct = None
        self._ct_half = None
        if rest == 1 or rest > 512:
            return
        n1, n2 = smooth, rest          # k = k1 + n1*k2 ; n = n2*a + b
        # analysis: X[k1 + n1 k2] = sum_b W2[k2,b] * tw*[k1,b] * DFT1_a(x[n2 a + b])[k1]
        # synthesis: x[n2 a + b] = iDFT1_k1( tw[k1,b] * sum_k2 W2i[b,k2] X[k1 + n1 k2] )[a]
        # BOTH stages are DFT matmuls on the MXU: a native fft over the
        # smooth factor (a non-minor axis) forces layout transposes between
        # stages that cost more than the n1^2 extra MACs (profiled). The
        # real-input (analysis) / real-output (synthesis) edges run as stacked
        # REAL matmuls: 2 real GEMMs instead of a complex one.
        k2b = np.outer(np.arange(n2), np.arange(n2))
        k1a = np.outer(np.arange(n1), np.arange(n1))
        E1 = np.exp(-2j * np.pi * k1a / n1)                                  # (k1, a)
        E1i = np.exp(2j * np.pi * k1a / n1) / n1                             # (a, k1)
        self._ct = dict(
            n1=n1, n2=n2,
            W2=np.exp(-2j * np.pi * k2b / n2).astype(np.complex64),          # (k2, b)
            W2i=(np.exp(2j * np.pi * k2b / n2) / n2).astype(np.complex64),   # (b, k2)
            tw=np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / nn).astype(np.complex64),  # (k1, b)
            # stacked real forms: E1ri @ x_real -> [Re(F1); Im(F1)] rows
            E1ri=np.concatenate([E1.real, E1.imag], axis=0).astype(np.float32),       # (2*k1, a)
            # [Re(E1i), -Im(E1i)] @ [Re(Z); Im(Z)] -> Re(E1i @ Z) columns
            E1iri=np.concatenate([E1i.real, -E1i.imag], axis=1).astype(np.float32),   # (a, 2*k1)
        )
        # Hermitian-half synthesis plan: z real => the twiddled Z entering
        # the k1-iDFT is conjugate-symmetric, so only k1 in [0, n1/2] is
        # computed — halving the big n2-point DFT matmul, the mirror
        # expansion copies, and the final real matmul. Requires n1 even and
        # n2 odd (row split n2 = n2h + (n2h-1)); falls back otherwise.
        self._ct_half = None
        if n1 % 2 == 0 and n2 % 2 == 1:
            h1 = n1 // 2 + 1
            n2h = n2 // 2 + 1                       # rows of the direct block
            W2i = self._ct["W2i"]
            W2m = W2i[:, n2h:][:, ::-1]             # (b, n2h-1): W2i[b, n2-1-c']
            ck = np.full(h1, 2.0)
            ck[0] = ck[-1] = 1.0                    # DC / n1-Nyquist appear once
            E1ih = np.concatenate(
                [ck * E1i.real[:, :h1], -ck * E1i.imag[:, :h1]], axis=1
            ).astype(np.float32)                     # (a, 2*h1)
            self._ct_half = dict(
                h1=h1, n2h=n2h,
                Wcat=np.concatenate([W2i[:, :n2h], W2m], axis=1).astype(np.complex64),  # (b, n2)
                twh=self._ct["tw"][:h1],             # (h1, b)
                E1ih=E1ih,
                # analysis half: rows c <= n2//2 of the W2 matmul cover
                # X[0 .. n2h*n1) exactly; the rest of the spectrum is the
                # Hermitian mirror (input is real)
                W2h=self._ct["W2"][:n2h],            # (n2h, b)
            )

    def _fft_full(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full complex spectrum of real slices (..., nn)."""
        if self._ct is None:
            ft_r = jnp.fft.rfft(x, axis=-1)
            return jnp.concatenate([ft_r, jnp.conj(ft_r[..., 1:-1])[..., ::-1]], axis=-1)
        ct = self._ct
        n1, n2 = ct["n1"], ct["n2"]
        # x[n2*a + b] -> (..., a, b)
        xr = x.reshape(*x.shape[:-1], n1, n2)
        # DFT over a -> k1 as ONE real matmul (real input: Re/Im rows stacked)
        F = jnp.einsum("ka,...ab->...kb", jnp.asarray(ct["E1ri"]), xr, precision=_PREC)   # (..., 2*k1, b)
        F1 = jax.lax.complex(F[..., :n1, :], F[..., n1:, :])
        F1 = F1 * jnp.conj(jnp.asarray(ct["tw"]))                        # (k1, b)
        X = jnp.einsum("...kb,cb->...ck", F1, jnp.asarray(ct["W2"]), precision=_PREC)     # over b -> k2; out (..., k2, k1)
        return X.reshape(*x.shape[:-1], n1 * n2)                          # k = k1 + n1*k2

    def _fft_half(self, x: jnp.ndarray) -> jnp.ndarray:
        """X[0 .. n2h*n1) of real slices (..., nn): the W2 DFT matmul
        restricted to rows c <= n2//2 — half the contraction output. The
        rest of the spectrum is conj-mirrored by the callers' static
        tables (real input)."""
        ct, ch = self._ct, self._ct_half
        n1, n2h = ct["n1"], ch["n2h"]
        xr = x.reshape(*x.shape[:-1], n1, ct["n2"])
        F = jnp.einsum("ka,...ab->...kb", jnp.asarray(ct["E1ri"]), xr, precision=_PREC)
        F1 = jax.lax.complex(F[..., :n1, :], F[..., n1:, :])
        F1 = F1 * jnp.conj(jnp.asarray(ct["tw"]))
        X = jnp.einsum("...kb,cb->...ck", F1, jnp.asarray(ch["W2h"]), precision=_PREC)
        return X.reshape(*x.shape[:-1], n2h * n1)

    def _irfft(self, fr: jnp.ndarray) -> jnp.ndarray:
        """Real inverse of a half spectrum (..., nh) -> (..., nn)."""
        if self._ct is None:
            return jnp.fft.irfft(fr, n=self.nn, axis=-1)
        ct = self._ct
        n1, n2 = ct["n1"], ct["n2"]
        if self._ct_half is not None:
            # Hermitian-half path: full[n1*c + k] for k <= n1/2 only.
            # Direct rows c <= n2//2 read fr; mirror rows read
            # conj(fr[nn - n1*c - k]) re-indexed to columns n1-k (and row
            # c'+1, col 0 for k=0) of the same (n2h, n1) reshape.
            ch = self._ct_half
            h1, n2h = ch["h1"], ch["n2h"]
            lead = fr.shape[:-1]
            Gp = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, n2h * n1 - self.nh)])
            Gp = Gp.reshape(*lead, n2h, n1)
            direct = Gp[..., :, :h1]                                      # (..., n2h, h1)
            mcol0 = jnp.conj(Gp[..., 1:, 0:1])                            # (..., n2h-1, 1)
            mrest = jnp.conj(Gp[..., : n2h - 1, n1 - h1 + 1:][..., ::-1])
            V2 = jnp.concatenate([direct, jnp.concatenate([mcol0, mrest], axis=-1)], axis=-2)
            Zt = jnp.einsum("bc,...ck->...kb", jnp.asarray(ch["Wcat"]), V2, precision=_PREC)
            Zt = Zt * jnp.asarray(ch["twh"])                              # (..., h1, b)
            Zs = jnp.concatenate([jnp.real(Zt), jnp.imag(Zt)], axis=-2)   # (..., 2*h1, b)
            z = jnp.einsum("ak,...kb->...ab", jnp.asarray(ch["E1ih"]), Zs, precision=_PREC)
            return z.reshape(*lead, n1 * n2)
        full = jnp.concatenate([fr, jnp.conj(fr[..., 1:-1])[..., ::-1]], axis=-1)
        Xr = full.reshape(*full.shape[:-1], n2, n1)                       # (k2, k1)
        Z = jnp.einsum("bc,...ck->...kb", jnp.asarray(ct["W2i"]), Xr, precision=_PREC)     # over k2 -> b; out (k1, b)
        Z = Z * jnp.asarray(ct["tw"])
        # iDFT over k1 -> a, real output only: ONE real matmul on stacked
        # [Re(Z); Im(Z)] rows against [Re(E1i), -Im(E1i)]
        Zs = jnp.concatenate([jnp.real(Z), jnp.imag(Z)], axis=-2)         # (..., 2*k1, b)
        z = jnp.einsum("ak,...kb->...ab", jnp.asarray(ct["E1iri"]), Zs, precision=_PREC)
        return z.reshape(*full.shape[:-1], n1 * n2)                       # n = n2*a + b

    def _build_inverse_gather(self):
        """Convert the synthesis scatter-add into a gather table.

        Flat value layout: for each bucket, the positive-bin weighted spectra
        flattened (F*M, zero-padded to a 128 multiple); then per bucket one
        mirror piece with its mirror-eligible bins' M values each (same
        padding); final slot is a zero sentinel. For every output position
        p < nh, inv_idx[p] lists the flat entries that accumulate into fr[p]
        (reference scatter: nsigtf.py:88-95; value u of bin j lands at
        win_range_j[(M//2 + u) % M])."""
        plan = self.plan
        nh = self.nh
        LANE = 128  # TPU minor-dim tile; see _piece_pads note below

        def aligned(n: int) -> int:
            return -(-n // LANE) * LANE

        entries: List[List[int]] = [[] for _ in range(nh)]
        # v3 entries for the fused path: (raw_idx, w_re, w_im) over the RAW
        # (unweighted, positive-pieces-only) layout — the synthesis weights
        # and the mirror conjugation ride the gather as static per-entry
        # weight tables (w_im = -w for mirror entries), so `backward` never
        # materializes weighted or mirror pieces. Same summands in the same
        # order as the legacy entries: bit-identical f32 results.
        entries3: List[List[tuple]] = [[] for _ in range(nh)]
        flat_off = 0
        raw_off = 0
        raw_starts = []
        # Every piece's offset is rounded up to a multiple of 128 (the TPU
        # minor-dim tile): the concat in `backward` then lowers to aligned
        # whole-tile copies instead of cross-tile read-modify-writes, which
        # profiling showed dominating synthesis. Gaps are zero-padded in
        # `backward` and never indexed.
        self._piece_pads = []  # per-piece zero padding (pos pieces, then mirrors)
        for b in self.buckets:
            M = b.M
            l2 = M // 2
            tgt = (l2 + np.arange(M)) % M
            raw_starts.append(raw_off)
            for j_local, j in enumerate(range(b.f_start, b.f_start + b.f_count)):
                pos = plan.wins[j][tgt]
                base = flat_off + j_local * M
                raw_base = raw_off + j_local * M
                for u in range(M):
                    p = int(pos[u])
                    if p < nh:
                        entries[p].append(base + u)
                        w = float(b.w_pos[j_local, u])
                        entries3[p].append((raw_base + u, w, w))
            width = b.f_count * M
            self._piece_pads.append(aligned(width) - width)
            flat_off += aligned(width)
            raw_off += aligned(width)
        for bi, b in enumerate(self.buckets):
            if b.w_neg is None:
                continue
            M = b.M
            l2 = M // 2
            tgt = (l2 + np.arange(M)) % M
            width = 0
            for row, j in enumerate(range(b.f_start + b.neg_lo, b.f_start + b.neg_hi)):
                jm = 2 * (self.nfreqs - 1) - j
                pos = plan.wins[jm][tgt]
                raw_base = raw_starts[bi] + (j - b.f_start) * M
                for u in range(M):
                    p = int(pos[u])
                    if p < nh:
                        entries[p].append(flat_off + width + u)
                        # mirror value u reads conj(spec[j, mu]) * w_neg
                        # (mu = u+1, clamped: nsigtf.py:71-77 rederived)
                        mu = u + 1 if u < M - 1 else M - 1
                        w = float(b.w_neg[row, u])
                        entries3[p].append((raw_base + mu, w, -w))
                width += M
            self._piece_pads.append(aligned(width) - width)
            flat_off += aligned(width)

        self._flat_len = flat_off
        self._raw_flat_len = raw_off
        O = max(len(e) for e in entries)
        inv_idx = np.full((nh, O), flat_off, dtype=np.int32)  # sentinel -> zero
        v3_idx = np.full((nh, O), raw_off, dtype=np.int32)    # sentinel (w=0 too)
        v3_wr = np.zeros((nh, O), dtype=np.float32)
        v3_wi = np.zeros((nh, O), dtype=np.float32)
        for p, e in enumerate(entries):
            inv_idx[p, : len(e)] = e
            for o, (ri, wr, wi) in enumerate(entries3[p]):
                v3_idx[p, o] = ri
                v3_wr[p, o] = wr
                v3_wi[p, o] = wi
        self._inv_idx = inv_idx
        self.inv_overlap = O
        self._build_v2_gather(v3_idx, v3_wr, v3_wi)

    def _build_v2_gather(self, v3_idx, v3_wr, v3_wi):
        """Fused synthesis assembly table (Hermitian-half plan only).

        `backward` can gather straight into the (n2, h1) layout the
        Hermitian-half iDFT consumes, skipping the intermediate half
        spectrum entirely: row r < n2h reads fr[n1*r + k] (direct block);
        row r >= n2h reads conj(fr[p']) with p' the mirror source of
        `_irfft`'s H block (column 0: 60*(c'+1); column k: 60*c' + n1-k).
        The gather reads the RAW positive-piece re/im planes with the
        synthesis weights / mirror conj (see _build_inverse_gather) and
        the per-row conj select folded in as static (rows, O) weight
        tables; the per-(row, parity) un-rotation phase stays a separate
        small multiply. Identical floating-point results to the legacy
        weighted-pieces path."""
        self._v2_idx = None
        self._fwd_half = None
        if self._ct_half is None:
            return
        n1 = self._ct["n1"]
        h1, n2h = self._ct_half["h1"], self._ct_half["n2h"]
        n2 = self._ct["n2"]
        p_of = np.zeros((n2, h1), dtype=np.int64)
        conj_m = np.zeros((n2, h1), dtype=bool)
        for c in range(n2h):                       # direct rows
            for k in range(h1):
                p_of[c, k] = n1 * c + k
        for cp in range(n2h - 1):                  # mirror rows
            r = n2h + cp
            conj_m[r, :] = True
            p_of[r, 0] = n1 * (cp + 1)
            for k in range(1, h1):
                p_of[r, k] = n1 * cp + (n1 - k)
        assert p_of.max() < self.nh
        rows = p_of.reshape(-1)
        self._v2_idx = v3_idx[rows]                              # (n2*h1, O)
        wr = v3_wr[rows]                                         # (n2*h1, O)
        wi = v3_wi[rows]                                         # (n2*h1, O)
        unrot = np.asarray(self._unrot)                          # (2, nh)
        ph = unrot[:, p_of]                                      # (2, n2, h1)
        ph = np.where(conj_m[None], np.conj(ph), ph)
        # v4: the per-row mirror conjugation (sign s on the summed imaginary
        # part) and the per-(row, parity) un-rotation phase are both static,
        # so they fold INTO the gather weight tables. One gather over the
        # stacked [re | im] plane with (rows, 2O) indices and two weighted
        # sums produce V2's re/im planes directly — no conj select pass, no
        # phase multiply pass, no intermediate complex g:
        #   V2 = (g_re + i·s·g_im)(p_re + i·p_im)
        #      => V2_re = Σ (wr·p_re)·v_re + Σ (-s·wi·p_im)·v_im
        #         V2_im = Σ (wr·p_im)·v_re + Σ ( s·wi·p_re)·v_im
        # the mirror-row conjugation acts on the SUMMED g, so it folds into
        # the static im-plane weights as a per-row sign (parity-independent):
        # complex(g_re, s*g_im) == the conj-selected g of the unfolded path.
        # Folding the per-(row, parity) phase into the weights as well was
        # measured SLOWER on-chip both as a stacked-plane (rows, 2O) gather
        # (2x gather output width) and as four parity-indexed weight tables
        # (S-expanded operand traffic) — PERFORMANCE.md round-4 log; the
        # phase stays a separate small (S, n2, h1) multiply.
        s = np.where(conj_m.reshape(-1), -1.0, 1.0)[:, None]     # (rows, 1)
        self._v2_wr = wr
        self._v2_wi = (s * wi).astype(np.float32)
        self._v2_phase = ph.reshape(2, n2, h1).astype(np.complex64)
        self._build_split_gather()
        self._build_forward_half()

    def _build_split_gather(self, width: int = 2):
        """Split the (rows, O) assembly gather into a dense (rows, width)
        main table plus a static overflow scatter-add (synth_split_gather).

        Entries per row are real-first / sentinel-padded
        (_build_inverse_gather), so columns [:width] carry every row's
        first `width` summands and columns [width:] are non-sentinel only
        for the few overflow rows (count > width; mean count is ~2.05 at
        the canonical geometry). The overflow row list is sorted and
        unique by construction — the scatter-add lowers to the fast XLA
        path."""
        self._v5_main = None
        self._v5_ov = None
        if self._v2_idx is None:
            return
        O = self._v2_idx.shape[1]
        if O <= width:
            # nothing to split: the dense gather is already minimal
            self._v5_main = (self._v2_idx, self._v2_wr, self._v2_wi)
            return
        sent = self._raw_flat_len
        self._v5_main = (
            np.ascontiguousarray(self._v2_idx[:, :width]),
            np.ascontiguousarray(self._v2_wr[:, :width]),
            np.ascontiguousarray(self._v2_wi[:, :width]),
        )
        counts = (self._v2_idx != sent).sum(1)
        ov_rows = np.where(counts > width)[0].astype(np.int32)
        if ov_rows.size:
            self._v5_ov = (
                ov_rows,
                np.ascontiguousarray(self._v2_idx[ov_rows, width:]),
                np.ascontiguousarray(self._v2_wr[ov_rows, width:]),
                np.ascontiguousarray(self._v2_wi[ov_rows, width:]),
            )

    def _build_forward_half(self):
        """Per-bucket analysis gather tables over the HALF spectrum.

        The analysis gathers read the extended full spectrum ft_ext
        (nn + maxM wrap). With _fft_half computing X on [0, Lh = n2h*n1)
        only, each gathered position p remaps statically: p < Lh reads
        X[p]; p in [Lh, nn) reads conj(X[nn-p]) (real input Hermitian
        mirror); p >= nn wraps to X[p-nn]. The conj rides as a -1 sign on
        the imaginary part, fused into the analysis weight multiply."""
        self._fwd_half = None
        if self._ct_half is None:
            return
        Lh = self._ct_half["n2h"] * self._ct["n1"]
        nn = self.nn
        if self.maxM > Lh:
            return
        tabs = []
        for b in self.buckets:
            M = b.M
            l2 = M // 2
            p = (b.starts[:, None] + ((np.arange(M) + l2) % M)[None, :]).astype(np.int64)
            src = np.where(p < Lh, p, np.where(p < nn, nn - p, p - nn))
            sgn = np.where((p >= Lh) & (p < nn), -1.0, 1.0)
            assert src.max() < Lh and src.min() >= 0
            tabs.append((src.astype(np.int32), sgn.astype(np.float32)))
        self._fwd_half = tabs

    # -- shape helpers -------------------------------------------------------

    def n_slices(self, length: int) -> int:
        """Number of slices produced for a signal of `length` samples
        (derived from the slicing generator, slicing.py:49-73)."""
        nb = -(-length // self.hhop)
        return (nb + 1) // 2 + 1

    def max_length(self, n_slices: int) -> int:
        """Largest signal length that still yields `n_slices` slices."""
        nb = 2 * (n_slices - 1)  # largest nb with (nb+1)//2+1 == n_slices
        return nb * self.hhop

    def block_shapes(self, batch: int, channels: int, length: int):
        S = self.n_slices(length)
        return [(batch, channels, b.f_count, S, b.M) for b in self.buckets]

    # -- forward -------------------------------------------------------------

    def _slice_temporal(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, L) -> windowed slices (B, C, S, sllen) in TEMPORAL order.

        Pure reshape + two strided views + one concat -- no gather. The
        reference's rotated physical layout is recovered spectrally via the
        per-parity rotation phases baked into the analysis weights."""
        B, C, L = x.shape
        hhop = self.hhop
        nb = -(-L // hhop)
        S = (nb + 1) // 2 + 1
        total = (2 * S + 2) * hhop                 # blocks 0..2S+1 (2 lead zeros)
        xb = jnp.pad(x, ((0, 0), (0, 0), (2 * hhop, total - 2 * hhop - L)))
        Y = xb.reshape(B, C, S + 1, 2 * hhop)
        raw = jnp.concatenate([Y[:, :, :-1], Y[:, :, 1:]], axis=-1)  # (B,C,S,4*hhop)
        return raw * jnp.asarray(self._slice_window)

    def slice_signal(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reference-layout (rotated) slices (slicing.py:51-72) -- kept for
        golden-parity tests; internal compute uses _slice_temporal."""
        sl = self._slice_temporal(x)
        hhop = self.hhop
        out = sl
        out = out.at[:, :, 0::2].set(jnp.roll(sl[:, :, 0::2], 3 * hhop, axis=-1))
        out = out.at[:, :, 1::2].set(jnp.roll(sl[:, :, 1::2], hhop, axis=-1))
        return out

    def forward(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Analysis: (B, C, L) float -> list of (B, C, F_b, S, M_b) complex64.

        Matches the reference pipeline slicing -> nsgtf_sl -> arrange
        (slicq.py:182-196): temporal slicing, one batched rFFT, then per
        bucket a contiguous-slice grab from the extended full spectrum, a
        fused complex-weight multiply (window x coefficient roll x arrange
        ramp x slice-rotation phase), and one batched iFFT."""
        slices = self._slice_temporal(x)                     # (B,C,S,nn)
        B, C, S = slices.shape[:3]
        parity = np.arange(S) % 2                            # (S,)

        if self._fwd_half is not None:
            # half-spectrum analysis: gathers remap into [0, Lh) with a
            # static conj sign (see _build_forward_half)
            ft_h = self._fft_half(slices)                    # (B,C,S,Lh)
            out = []
            for b, (src, sgn) in zip(self.buckets, self._fwd_half):
                t = ft_h[..., jnp.asarray(src)]              # (B,C,S,F,M)
                t = jax.lax.complex(jnp.real(t), jnp.imag(t) * jnp.asarray(sgn))
                W = jnp.asarray(b.fwd_w)[parity]             # (S,F,M)
                c = jnp.einsum("bcsfm,mn->bcsfn", t * W[None, None], jnp.asarray(b.dft_inv), precision=_PREC)
                out.append(jnp.moveaxis(c, 3, 2))            # (B,C,F,S,M)
            return out

        ft_full = self._fft_full(slices)                     # (B,C,S,nn)
        ft_ext = jnp.concatenate([ft_full, ft_full[..., : self.maxM]], axis=-1)

        out = []
        for b in self.buckets:
            M = b.M
            l2 = M // 2
            # static index table: contiguous circular window slice + roll
            idx = (b.starts[:, None] + ((np.arange(M) + l2) % M)[None, :]).astype(np.int32)
            t = ft_ext[..., jnp.asarray(idx)]                # (B,C,S,F,M)
            W = jnp.asarray(b.fwd_w)[parity]                 # (S,F,M)
            c = jnp.einsum("bcsfm,mn->bcsfn", t * W[None, None], jnp.asarray(b.dft_inv), precision=_PREC)
            out.append(jnp.moveaxis(c, 3, 2))                # (B,C,F,S,M)
        return out

    # -- inverse -------------------------------------------------------------

    def backward(self, blocks: Sequence[jnp.ndarray], length: int) -> jnp.ndarray:
        """Synthesis: list of (B, C, F_b, S, M_b) complex -> (B, C, length).

        Matches arrange(bwd) -> nsigtf_sl -> unslicing -> reblock
        (slicq.py:198-230)."""
        B, C, _, S, _ = blocks[0].shape
        parity = np.arange(S) % 2

        specs = []
        for b, cb in zip(self.buckets, blocks):
            c = jnp.moveaxis(cb, 2, 3)                       # (B,C,S,F,M)
            spec = jnp.einsum(
                "bcsfm,mn->bcsfn", c.astype(jnp.complex64), jnp.asarray(b.dft_fwd),
                precision=_PREC,
            )
            ramp = jnp.asarray(b.inv_ramp)[parity]           # (S,M)
            spec = spec * ramp[None, None, :, None, :]
            specs.append(spec)

        if self._v2_idx is not None:
            # fused assembly: gather the RAW positive-piece re/im planes
            # straight into the Hermitian-half iDFT's (n2, h1) input
            # layout. The synthesis weights, the mirror conjugation AND
            # the per-row conj select ride the gather as static per-entry
            # weight tables (_build_v2_gather), so no weighted/mirror
            # pieces are materialized and no conj pass runs; only the
            # small per-(row, parity) un-rotation phase multiply remains
            # (folding it into the weights too was measured slower — see
            # _build_v2_gather). Same summands in the same order as the
            # unfused path: bit-identical in f32.
            # synth_staging="bf16" stages the planes in bfloat16 (halving
            # the concat+gather bytes); the weight multiply promotes to
            # f32, so the overlap sum still accumulates in f32.
            ct, ch = self._ct, self._ct_half
            n1, n2, h1 = ct["n1"], ct["n2"], ch["h1"]
            dt = jnp.bfloat16 if self.synth_staging == "bf16" else jnp.float32
            pads = self._piece_pads[: len(self.buckets)]

            def planes(part):
                # pieces land at 128-aligned offsets (_build_inverse_gather):
                # the concat copies whole tiles instead of shifting across
                # tile boundaries
                ps = [part(s).astype(dt).reshape(B, C, S, -1) for s in specs]
                ps = [
                    jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else v
                    for v, pad in zip(ps, pads)
                ]
                return jnp.concatenate(ps + [jnp.zeros((B, C, S, 1), dt)], axis=-1)

            if self.synth_split_gather and self._v5_main is not None:
                # width-2 main gather (every row's first two summands) plus
                # a static sorted-unique scatter-add for the few overflow
                # rows — halves the dense gather's sentinel-heavy read
                # traffic (_build_split_gather)
                mi, mwr, mwi = (jnp.asarray(a) for a in self._v5_main)
                P_re, P_im = planes(jnp.real), planes(jnp.imag)
                g_re = (jnp.take(P_re, mi, axis=-1) * mwr).sum(-1)
                g_im = (jnp.take(P_im, mi, axis=-1) * mwi).sum(-1)
                if self._v5_ov is not None:
                    ovr, oi, owr, owi = self._v5_ov
                    ovr_j = jnp.asarray(ovr)
                    o_re = (jnp.take(P_re, jnp.asarray(oi), axis=-1) * jnp.asarray(owr)).sum(-1)
                    o_im = (jnp.take(P_im, jnp.asarray(oi), axis=-1) * jnp.asarray(owi)).sum(-1)
                    g_re = g_re.at[..., ovr_j].add(
                        o_re, unique_indices=True, indices_are_sorted=True)
                    g_im = g_im.at[..., ovr_j].add(
                        o_im, unique_indices=True, indices_are_sorted=True)
            else:
                idx = jnp.asarray(self._v2_idx)
                g_re = (jnp.take(planes(jnp.real), idx, axis=-1) * jnp.asarray(self._v2_wr)).sum(-1)
                g_im = (jnp.take(planes(jnp.imag), idx, axis=-1) * jnp.asarray(self._v2_wi)).sum(-1)
            g = jax.lax.complex(g_re, g_im).reshape(B, C, S, n2, h1)
            V2 = g * jnp.asarray(self._v2_phase)[parity][None, None]
            Zt = jnp.einsum("bc,...ck->...kb", jnp.asarray(ch["Wcat"]), V2, precision=_PREC)
            Zt = Zt * jnp.asarray(ch["twh"])
            Zs = jnp.concatenate([jnp.real(Zt), jnp.imag(Zt)], axis=-2)
            z = jnp.einsum("ak,...kb->...ab", jnp.asarray(ch["E1ih"]), Zs, precision=_PREC)
            sig_slices = z.reshape(B, C, S, n1 * n2)
        else:
            # legacy scatter-as-gather over the nh half spectrum (non-half
            # plans): weighted positive pieces plus materialized mirror
            # pieces, then the un-rotation phase and the full iDFT
            vals = [
                (spec * jnp.asarray(b.w_pos)).reshape(B, C, S, -1)
                for b, spec in zip(self.buckets, specs)
            ]
            for b, spec in zip(self.buckets, specs):
                if b.w_neg is None:
                    continue
                sub = spec[..., b.neg_lo: b.neg_hi, :]
                # mirror spectrum: value u is conj(spec[map_u]) with
                # map = [1, 2, ..., M-1, M-1] (nsigtf.py:71-77 rederived)
                neg = jnp.concatenate([sub[..., 1:], sub[..., -1:]], axis=-1).conj()
                vals.append((neg * jnp.asarray(b.w_neg)).reshape(B, C, S, -1))
            vals = [
                jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else v
                for v, pad in zip(vals, self._piece_pads)
            ]
            V = jnp.concatenate(vals + [jnp.zeros((B, C, S, 1), jnp.complex64)], axis=-1)
            fr = jnp.take(V, jnp.asarray(self._inv_idx), axis=-1).sum(-1)  # (B,C,S,nh)
            # physical->temporal slice un-rotation as a spectral phase
            fr = fr * jnp.asarray(self._unrot)[parity][None, None]
            sig_slices = self._irfft(fr)                                   # (B,C,S,nn)
        return self.unslice_signal(sig_slices, length)

    def unslice_signal(self, sig_slices: jnp.ndarray, length: int) -> jnp.ndarray:
        """Overlap-add reassembly of TEMPORAL-order slices (the reference's
        slicequads un-rotation, unslicing.py:6-30, is subsumed by the
        spectral un-rotation phase in backward): two strided adds, the
        2-block head drop (slicq.py:218), and truncation."""
        B, C, S, _ = sig_slices.shape
        hhop = self.hhop
        quads = sig_slices.reshape(B, C, S, 4, hhop)
        # output block m' (after dropping 2): quad[m'//2, m'%2 + 2] + quad[(m'+2)//2, m'%2]
        # pad+add fuses on TPU; .at[].add would lower to dynamic-update-slice
        P1 = quads[:, :, :, 2:4, :].reshape(B, C, 2 * S * hhop)
        P2 = quads[:, :, 1:, 0:2, :].reshape(B, C, 2 * (S - 1) * hhop)
        out = P1 + jnp.pad(P2, ((0, 0), (0, 0), (0, 2 * hhop)))
        return out[..., :length]

    # -- misc ----------------------------------------------------------------

    def coef_factors(self):
        return self.plan.coef_factors()

    @property
    def fbins_actual(self) -> int:
        return self.nfreqs

    def config_dict(self):
        return dict(
            scale=self.scale_name, fbins=self.fbins, fmin=self.fmin,
            fmax=self.fmax, fgamma=self.fgamma, fs=self.fs,
            sllen=self.sllen, trlen=self.trlen,
        )


def make_slicqt(scale: str = "bark", fbins: int = 262, fmin: float = 32.9, **kw) -> SliCQT:
    return SliCQT(scale=scale, fbins=fbins, fmin=fmin, **kw)
