"""Audio I/O and training datasets (host-side, NumPy).

Torch/torchaudio/musdb-free re-design of the reference's data layer
(sevagh/xumx-sliCQ-V2 data.py): WAV I/O via scipy, the MUSDB18-HQ wav-tree
protocol implemented directly (including musdb's canonical 14-track
validation split), the same sampling/augmentation scheme (random chunking,
random track mixing, gain + channelswap, data.py:183-208,316-364), plus a
synthetic dataset so the training stack is testable without MUSDB on disk.

The stem order contract everywhere is (mix, bass, vocals, other, drums)
(data.py:381-390) -- the Separator.sources order derives from it.
"""

import os
import random
import threading
import queue
from pathlib import Path
from typing import Callable, Iterator, List, Optional

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

SOURCES = ["bass", "vocals", "other", "drums"]

# musdb's canonical validation tracks (musdb.DB split="valid")
MUSDB_VALIDATION_TRACKS = [
    "Actions - One Minute Smile",
    "Clara Berry And Wooldog - Waltz For My Victims",
    "Johnny Lokke - Promises & Lies",
    "Patrick Talbot - A Reason To Leave",
    "Triviul - Angelsaint",
    "Alexander Ross - Goodbye Bolero",
    "Fergessen - Nos Palpitants",
    "Leaf - Summerghost",
    "Skelpolu - Human Mistakes",
    "Young Griffo - Pennies",
    "ANiMAL - Rockshow",
    "James May - On The Line",
    "Meaxic - Take A Step",
    "Traffic Experiment - Sirens",
]


# ---------------------------------------------------------------------------
# wav I/O
# ---------------------------------------------------------------------------


def load_info(path: str) -> dict:
    """Audio metadata: samplerate, samples, channels, duration."""
    sr, data = wavfile.read(str(path), mmap=True)
    samples = data.shape[0]
    channels = 1 if data.ndim == 1 else data.shape[1]
    return {
        "samplerate": sr,
        "samples": samples,
        "channels": channels,
        "duration": samples / sr,
    }


# PCM full-scale factors; 1/2^k is exact in binary so int->float32 followed
# by a float32 multiply is bit-identical to the float64 route it replaces
_PCM_SCALE = {"int16": 1.0 / 32768.0, "int32": 1.0 / 2147483648.0}


def pcm_scale_info(dtype) -> tuple:
    """(scale, offset) such that float = (raw - offset) * scale for a wav
    sample dtype; raises on unsupported dtypes. The single source of truth
    for PCM normalization — shared by the host loader and the
    device-resident staging paths (ops/bsseval.py::DeviceBssEval), which
    ship raw ints over the link and scale on-chip."""
    name = np.dtype(dtype).name
    if name in ("float32", "float64"):
        return 1.0, 0.0
    if name in _PCM_SCALE:
        return _PCM_SCALE[name], 0.0
    if name == "uint8":
        return 1.0 / 128.0, 128.0
    raise ValueError(f"unsupported wav dtype {name}")


def apply_pcm_scale(x, xp=np, src_dtype=None):
    """Normalize a raw-PCM (or already-float) array to float by its wav
    full-scale: float = (raw - offset) * scale. The one shared
    implementation behind the host fallback (float64) and the on-device
    staging paths (float32) — ops/bsseval.py::DeviceBssEval,
    eval_track_device, evaluation.separate_track_device.

    The dtype is validated BEFORE any array conversion: jax silently
    downcasts int64 -> int32, which would both mask the unsupported dtype
    and apply the wrong full-scale. Pass `src_dtype` when `x` has already
    been staged through jax (staging itself may downcast) so the check and
    scale come from the source array's dtype."""
    scale, offset = pcm_scale_info(np.dtype(src_dtype if src_dtype is not None else x.dtype))
    if xp is np:
        a = np.asarray(x, np.float64)
        if offset:
            a = a - offset
        if scale != 1.0:
            a = a * scale
        return a
    a = xp.asarray(x).astype(xp.float32)
    if offset:
        a = a - np.float32(offset)
    if scale != 1.0:
        a = a * np.float32(scale)
    return a


def _to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    scale = _PCM_SCALE.get(data.dtype.name)
    if scale is not None:
        out = data.astype(np.float32)
        out *= np.float32(scale)
        return out
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    raise ValueError(f"unsupported wav dtype {data.dtype}")


def _crop_to_float32(seg: np.ndarray, gain: float = 1.0, out: Optional[np.ndarray] = None) -> np.ndarray:
    """(samples, C) wav slice (any supported dtype, typically a memmap view)
    -> (C, samples) float32 scaled by PCM full-scale x gain, in ONE pass
    into `out` (or a fresh OWNED array — never a view of the input).

    The single shared conversion path for load_audio, TrackTreeDataset
    crops, and the folded-augmentation fill (keeps uint8 offset handling
    and the unsupported-dtype error in every route)."""
    scale = _PCM_SCALE.get(seg.dtype.name)
    if scale is None and seg.dtype not in (np.float32, np.float64):
        res = _to_float32(np.asarray(seg)).T  # uint8 offset / raises unknown
        if gain != 1.0:
            res = res * np.float32(gain)
        if out is None:
            return np.array(res, np.float32, order="C")
        out[...] = res
        return out
    g = np.float32(gain * (scale if scale is not None else 1.0))
    if out is None:
        out = np.empty((seg.shape[1], seg.shape[0]), np.float32)
    np.multiply(seg.T, g, out=out)
    return out


def load_audio(path: str, start: float = 0.0, dur: Optional[float] = None):
    """Load a wav file -> ((channels, samples) float32, samplerate).

    Single-pass hot path: for PCM wavs the transpose + int->float convert +
    full-scale multiply fuse into one `np.multiply(..., out=)` write (the
    naive route costs three full passes per read; at 256 stem reads per
    training batch that is the host loader's dominant cost). Always returns
    an owned array, never an mmap-backed view."""
    sr, data = wavfile.read(str(path), mmap=True)
    if dur is not None:
        lo = int(start * sr)
        hi = lo + int(dur * sr)
        data = data[lo:hi]
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    return _crop_to_float32(data), sr


def load_audio_raw(path: str):
    """Load a wav file WITHOUT float conversion -> ((channels, samples)
    in the file's own dtype, samplerate).

    For PCM_16 sources (MUSDB18-HQ stems) this is the lossless
    half-the-bytes staging format for device-resident evaluation: the
    int16 array ships over the host->device link as-is and the 1/32768
    scaling happens on-chip (ops/bsseval.py::DeviceBssEval)."""
    sr, data = wavfile.read(str(path), mmap=True)
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    return data.T.copy(), sr


def save_audio(path: str, audio: np.ndarray, sample_rate: int):
    """Write (channels, samples) float32 -> 32-bit float PCM wav (the
    reference writes PCM_F wavs, inference.py:129-138)."""
    wavfile.write(str(path), int(sample_rate), np.asarray(audio, np.float32).T)


def preprocess_audio(audio: np.ndarray, rate: Optional[float] = None, model_rate: Optional[float] = None) -> np.ndarray:
    """Normalize to (nb_samples, 2, nb_timesteps), resampling if needed
    (reference data.py:98-156)."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None, None, :]
    elif audio.ndim == 2:
        if min(audio.shape) <= 2:
            audio = audio[None, ...]
        else:
            audio = audio[:, None, :]
    if audio.shape[1] > audio.shape[2]:
        audio = np.swapaxes(audio, 1, 2)
    if audio.shape[1] > 2:
        audio = audio[:, :2]
    if audio.shape[1] == 1:
        audio = np.repeat(audio, 2, axis=1)
    if rate is not None and model_rate is not None and rate != model_rate:
        from math import gcd

        g = gcd(int(rate), int(model_rate))
        audio = resample_poly(audio, int(model_rate) // g, int(rate) // g, axis=-1).astype(np.float32)
    return audio


# ---------------------------------------------------------------------------
# augmentations
# ---------------------------------------------------------------------------


def _augment_gain(audio: np.ndarray, rng: random.Random, low=0.25, high=1.25) -> np.ndarray:
    return audio * (low + rng.random() * (high - low))


def _augment_channelswap(audio: np.ndarray, rng: random.Random) -> np.ndarray:
    if audio.shape[0] == 2 and rng.random() < 0.5:
        return audio[::-1]  # reversed view; downstream only reads
    return audio


class AugChain:
    """Composed augmentation chain. `canonical_fold=True` (set only by
    aug_from_str for a duplicate-free gain/channelswap chain built from the
    module's own augment fns) lets TrackTreeDataset fold the chain into the
    single load-multiply pass (same RNG draw protocol, see _fill_item).
    Custom chains — even ones reusing these names — keep the generic path."""

    def __init__(self, names: List[str], fns: List[Callable], canonical_fold: bool = False):
        self.names = tuple(names)
        self._fns = fns
        self.canonical_fold = canonical_fold

    def __call__(self, audio, rng):
        for f in self._fns:
            audio = f(audio, rng)
        return audio


def aug_from_str(names: List[str]) -> AugChain:
    fns = {"gain": _augment_gain, "channelswap": _augment_channelswap}
    canonical = set(names) <= set(fns) and len(set(names)) == len(names)
    return AugChain(list(names), [fns[n] for n in names], canonical_fold=canonical)


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


class TrackTreeDataset:
    """Dataset over a wav directory tree with per-track stem files
    (MUSDB18-HQ layout: root/<subset>/<track>/{mixture,bass,drums,vocals,other}.wav).

    Sampling protocol mirrors the reference MUSDBDataset (data.py:316-390):
    training draws `samples_per_track` random excerpts per track per epoch,
    optionally assembling a random-track mix per source with gain/channelswap
    augmentations; validation yields full pre-mixed tracks deterministically.

    __getitem__ returns (5, channels, samples) float32 stacked as
    (mix, bass, vocals, other, drums)."""

    sample_rate = 44100.0

    def __init__(
        self,
        root: str,
        split: str = "train",
        subset_dir: Optional[str] = None,
        seq_duration: Optional[float] = 6.0,
        samples_per_track: int = 64,
        source_augmentations: Optional[Callable] = None,
        random_track_mix: bool = False,
        fixed_start: float = -1.0,
        seed: int = 42,
        in_memory: bool = False,
        validation_tracks: Optional[List[str]] = None,
    ):
        self.root = Path(root)
        self.split = split
        self.seq_duration = seq_duration
        self.samples_per_track = samples_per_track
        self.source_augmentations = source_augmentations or (lambda a, rng: a)
        self.random_track_mix = random_track_mix
        self.fixed_start = fixed_start
        self.rng = random.Random(seed)
        self.in_memory = in_memory

        if subset_dir is None:
            # musdb convention: train/valid both live under "train",
            # stratified by track name; a test subset lives under "test".
            subset_dir = "test" if split == "test" else "train"
        base = self.root / subset_dir
        if not base.exists():
            # periphery-style layout: root/{train,valid}/<track>
            base = self.root / split
        if not base.exists():
            raise FileNotFoundError(f"no dataset directory at {base}")

        if validation_tracks is None:
            validation_tracks = MUSDB_VALIDATION_TRACKS
        names = sorted(d.name for d in base.iterdir() if d.is_dir())
        if (self.root / "train").exists() and subset_dir == "train" and split in ("train", "valid"):
            if split == "valid":
                names = [n for n in names if n in validation_tracks] or names
            else:
                names = [n for n in names if n not in validation_tracks]

        self.track_dirs = [base / n for n in names]
        self._stem_cache = {}
        self.tracks = []
        for d in self.track_dirs:
            info = load_info(d / "mixture.wav")
            entry = {
                "path": d,
                "name": d.name,
                "duration": info["duration"],
                "samples": info["samples"],
                "channels": info["channels"],
            }
            if in_memory:
                entry["audio"] = {
                    s: load_audio(d / f"{s}.wav")[0] for s in ["mixture"] + SOURCES
                }
            self.tracks.append(entry)
        if self.seq_duration and self.tracks:
            # fixed item shape -> DataLoader can collate without copies
            # (workers write items straight into the batch buffer)
            self.item_shape = (
                5, self.tracks[0]["channels"],
                int(self.seq_duration * self.sample_rate),
            )

    def __len__(self):
        return len(self.tracks) * self.samples_per_track

    def _open_stem(self, track, source):
        """Cached (samplerate, (samples, C) memmap) per stem: random-crop
        sampling reads every stem hundreds of times per epoch, and a fresh
        wavfile.read costs an open + header parse + mmap setup each time.
        ~5 fds per track stay open (MUSDB train: 360 — well under default
        ulimits). Benign under threads: worst case two workers both open."""
        key = (track["name"], source)
        ent = self._stem_cache.get(key)
        if ent is None:
            sr, data = wavfile.read(str(track["path"] / f"{source}.wav"), mmap=True)
            if data.ndim == 1:
                data = data[:, None]
            ent = (sr, data)
            self._stem_cache[key] = ent
        return ent

    def _read(self, track, source, start_s, dur_s):
        if self.in_memory:
            a = track["audio"][source]
            if dur_s is None:
                return a
            lo = int(start_s * self.sample_rate)
            return a[:, lo: lo + int(dur_s * self.sample_rate)]
        if dur_s is None:
            return load_audio(track["path"] / f"{source}.wav")[0]
        sr, data = self._open_stem(track, source)
        lo = int(start_s * sr)
        return _crop_to_float32(data[lo: lo + int(dur_s * sr)])

    def __getitem__(self, index: int) -> np.ndarray:
        return self._getitem_rng(index, self.rng)

    def getitem_seeded(self, index: int, seed: int) -> np.ndarray:
        """Deterministic item from a private RNG — the DataLoader derives
        the seed from (loader seed, epoch, batch, item) position, so sampled
        crops/augments are reproducible regardless of worker count, thread
        completion order, or prior-epoch consumption."""
        return self._getitem_rng(index, random.Random(seed))

    def getitem_into(self, out: np.ndarray, index: int, seed: Optional[int] = None):
        """Fill a caller-provided (5, C, n) float32 buffer (a batch-array
        row) in place — the DataLoader's zero-copy collate path. seed=None
        draws from the dataset's own RNG (serial use)."""
        rng = self.rng if seed is None else random.Random(seed)
        self._fill_item(out, index, rng)

    def _getitem_rng(self, index: int, rng: random.Random) -> np.ndarray:
        if self.seq_duration:
            out = np.empty(self.item_shape, np.float32)
            self._fill_item(out, index, rng)
            return out

        track = self.tracks[index // self.samples_per_track]
        x = self._read(track, "mixture", 0, None)
        ys = {s: self._read(track, s, 0, None) for s in SOURCES}
        return np.stack([x, ys["bass"], ys["vocals"], ys["other"], ys["drums"]]).astype(np.float32)

    def _fill_item(self, out: np.ndarray, index: int, rng: random.Random):
        """Write one training item into out (5, C, n): each stem lands in
        its final row in ONE pass. When the augmentation chain is the
        canonical gain/channelswap set, gain folds into the PCM full-scale
        multiply and the swap into the transpose view, so the memmap'd wav
        bytes go straight to the batch buffer (identical RNG draw sequence
        to the generic chain)."""
        track = self.tracks[index // self.samples_per_track]
        aug = self.source_augmentations
        # only the canonical chain built by aug_from_str folds (custom
        # chains — even ones reusing these names — keep the generic path)
        foldable = getattr(aug, "canonical_fold", False) and not self.in_memory
        n = out.shape[-1]
        for k, source in enumerate(SOURCES):
            if self.random_track_mix:
                track = rng.choice(self.tracks)
            dur = min(track["duration"], self.seq_duration)
            if self.fixed_start < 0:
                start = rng.uniform(0, track["duration"] - dur)
            else:
                start = self.fixed_start
            if foldable:
                sr, data = self._open_stem(track, source)
                seg = data[int(start * sr): int(start * sr) + int(dur * sr)]
                gain = 1.0
                swap = False
                for name in aug.names:  # same draws as _augment_*
                    if name == "gain":
                        gain = 0.25 + rng.random() * 1.0
                    elif name == "channelswap" and seg.shape[1] == 2:
                        swap = rng.random() < 0.5
                m = min(seg.shape[0], n)
                seg = seg[:m, ::-1] if swap else seg[:m]
                _crop_to_float32(seg, gain=gain, out=out[1 + k, :, :m])
                if m < n:
                    out[1 + k, :, m:] = 0.0
                continue
            audio = self._read(track, source, start, dur)
            audio = aug(audio, rng)
            m = min(audio.shape[-1], n)
            out[1 + k, :, :m] = audio[:, :m]
            if m < n:
                out[1 + k, :, m:] = 0.0
        np.sum(out[1:], axis=0, out=out[0])


class MUSDBDataset(TrackTreeDataset):
    """MUSDB18-HQ dataset (reference data.py:211-403)."""

    @staticmethod
    def load_datasets(seed: int, train_seq_dur: float, samples_per_track: int = 64, musdb_root: str = "/MUSDB18-HQ"):
        augs = aug_from_str(["gain", "channelswap"])
        train = MUSDBDataset(
            root=musdb_root, split="train", seq_duration=train_seq_dur,
            samples_per_track=samples_per_track, source_augmentations=augs,
            random_track_mix=True, seed=seed,
        )
        valid = MUSDBDataset(
            root=musdb_root, split="valid", seq_duration=None, samples_per_track=1, seed=seed,
        )
        return train, valid


class PeripheryDataset(TrackTreeDataset):
    """Periphery wav-tree dataset, loaded fully to RAM
    (reference data.py:406-586)."""

    def __init__(self, *args, **kw):
        kw.setdefault("in_memory", True)
        super().__init__(*args, **kw)

    @staticmethod
    def load_datasets(seed: int, train_seq_dur: float, samples_per_track: int = 64, periphery_root: str = "/Periphery"):
        augs = aug_from_str(["gain", "channelswap"])
        train = PeripheryDataset(
            root=periphery_root, split="train", subset_dir="train",
            seq_duration=train_seq_dur, samples_per_track=samples_per_track,
            source_augmentations=augs, random_track_mix=True, seed=seed,
        )
        valid = PeripheryDataset(
            root=periphery_root, split="valid", subset_dir="valid",
            seq_duration=None, samples_per_track=1, seed=seed,
        )
        return train, valid


class SyntheticDataset:
    """Deterministic synthetic stems for tests/CI (no MUSDB on disk).

    Each 'track' is a sum of per-source band-limited tonal/noise signals so
    the 4 stems occupy different spectral regions -- enough structure for a
    training loop to reduce loss."""

    sample_rate = 44100.0

    def __init__(self, n_tracks=4, seq_duration=2.0, samples_per_track=4, seed=0, track_duration=8.0):
        self.n_tracks = n_tracks
        self.seq_duration = seq_duration
        self.samples_per_track = samples_per_track
        self.track_duration = track_duration
        rng = np.random.default_rng(seed)
        n = int(track_duration * self.sample_rate)
        t = np.arange(n) / self.sample_rate
        self._tracks = []
        bands = [(41.0, 120.0), (220.0, 880.0), (1000.0, 3000.0), (80.0, 8000.0)]
        for _ in range(n_tracks):
            stems = []
            for (lo, hi) in bands:
                f0 = rng.uniform(lo, hi)
                sig = np.stack([
                    0.2 * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6.28))
                    + 0.05 * rng.standard_normal(n)
                    for _ in range(2)
                ])
                env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.1, 2.0) * t))
                stems.append((sig * env).astype(np.float32))
            self._tracks.append(np.stack(stems))  # (4, 2, n)
        self.rng = random.Random(seed)

    def __len__(self):
        return self.n_tracks * self.samples_per_track

    def __getitem__(self, index):
        return self._getitem_rng(index, self.rng)

    def getitem_seeded(self, index, seed):
        return self._getitem_rng(index, random.Random(seed))

    def _getitem_rng(self, index, rng):
        stems = self._tracks[index // self.samples_per_track]
        if self.seq_duration:
            n = int(self.seq_duration * self.sample_rate)
            # max(..., 1): seq_duration == track_duration leaves no slack,
            # randrange(0, 0) would raise
            lo = rng.randrange(0, max(stems.shape[-1] - n, 1))
            stems = stems[..., lo: lo + n]
        x = stems.sum(0)
        return np.concatenate([x[None], stems]).astype(np.float32)


# ---------------------------------------------------------------------------
# batching
# ---------------------------------------------------------------------------


def pad_collate(items: List[np.ndarray]) -> np.ndarray:
    """Zero-pad variable-length items to a common length
    (reference custom_collate, data.py:14-36)."""
    max_len = max(it.shape[-1] for it in items)
    if all(it.shape[-1] == max_len for it in items):  # common equal-length case
        return np.stack(items).astype(np.float32, copy=False)
    out = np.zeros((len(items), *items[0].shape[:-1], max_len), np.float32)
    for i, it in enumerate(items):
        out[i, ..., : it.shape[-1]] = it
    return out


class DataLoader:
    """Minimal host data loader: shuffling, batching, optional background
    thread prefetch (replaces torch DataLoader workers, training.py:329-338).

    For datasets exposing `getitem_seeded`/`getitem_into`, every item's RNG
    seed is DERIVED from (loader seed, epoch, batch index, item index) —
    never drawn from a shared stream — so the sampled data is identical for
    any `workers` count (including 0), any prefetch depth, and regardless
    of whether an earlier epoch was consumed fully or abandoned early.
    workers > 0 loads a batch's items through a thread pool (numpy
    conversion and mmap page-fault IO both release the GIL, so threads
    overlap wav reads even on a small host). Datasets without the seeded
    protocol fall back to serial `dataset[i]` loading."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False, seed: int = 0, prefetch: int = 2, drop_last: bool = False, workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.workers = workers
        self._epoch = 0
        self._seeded = hasattr(dataset, "getitem_seeded")
        self._pool = None
        if workers > 0 and self._seeded:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _item_seed(self, epoch: int, bi: int, ii: int) -> int:
        # collision-free field packing (not a hash): unique per position
        return (
            ((self.seed & 0xFFFFFFFF) << 96)
            | ((epoch & 0xFFFFFFFF) << 64)
            | ((bi & 0xFFFFFFFF) << 32)
            | (ii & 0xFFFFFFFF)
        )

    def _load_items(self, sel, epoch: int, bi: int) -> List[np.ndarray]:
        if self._seeded:
            geti = self.dataset.getitem_seeded
            if self._pool is not None:
                futs = [
                    self._pool.submit(geti, int(j), self._item_seed(epoch, bi, ii))
                    for ii, j in enumerate(sel)
                ]
                return [f.result() for f in futs]
            return [geti(int(j), self._item_seed(epoch, bi, ii)) for ii, j in enumerate(sel)]
        return [self.dataset[int(j)] for j in sel]

    def _batches(self) -> Iterator[np.ndarray]:
        epoch = self._epoch
        self._epoch += 1
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        # zero-copy collate: fixed-shape datasets fill rows of a
        # preallocated batch buffer in place (no per-item alloc, no stack)
        shape = getattr(self.dataset, "item_shape", None)
        into = getattr(self.dataset, "getitem_into", None)
        for bi, i in enumerate(range(0, len(idx), self.batch_size)):
            sel = idx[i: i + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            if shape is not None and into is not None:
                batch = np.empty((len(sel), *shape), np.float32)
                if self._pool is not None:
                    futs = [
                        self._pool.submit(into, batch[ii], int(j), self._item_seed(epoch, bi, ii))
                        for ii, j in enumerate(sel)
                    ]
                    for f in futs:
                        f.result()
                else:
                    for ii, j in enumerate(sel):
                        into(batch[ii], int(j), self._item_seed(epoch, bi, ii))
                yield batch
            else:
                yield pad_collate(self._load_items(sel, epoch, bi))

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def worker():
            try:
                for b in self._batches():
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                # deliver the sentinel with the same stop-aware bounded put:
                # a plain put_nowait would drop it whenever the queue is
                # full at epoch end, leaving the consumer blocked in q.get()
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        th = threading.Thread(target=worker, daemon=True, name="slicq-prefetch")
        th.start()
        try:
            while True:
                b = q.get()
                if b is sentinel:
                    break
                yield b
        finally:
            # abandoned mid-epoch (e.g. --max-batches-per-epoch): unblock
            # the producer and release its prefetched batch buffers
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            th.join(timeout=5.0)
