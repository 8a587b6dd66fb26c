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


def _to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0)
    raise ValueError(f"unsupported wav dtype {data.dtype}")


def load_audio(path: str, start: float = 0.0, dur: Optional[float] = None):
    """Load a wav file -> ((channels, samples) float32, samplerate)."""
    sr, data = wavfile.read(str(path), mmap=True)
    if dur is not None:
        lo = int(start * sr)
        hi = lo + int(dur * sr)
        data = data[lo:hi]
    data = _to_float32(np.asarray(data))
    if data.ndim == 1:
        data = data[:, None]
    return data.T.copy(), sr


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
        return audio[::-1].copy()
    return audio


def aug_from_str(names: List[str]) -> Callable:
    fns = {"gain": _augment_gain, "channelswap": _augment_channelswap}
    chosen = [fns[n] for n in names]

    def apply(audio, rng):
        for f in chosen:
            audio = f(audio, rng)
        return audio

    return apply


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
        self.tracks = []
        for d in self.track_dirs:
            info = load_info(d / "mixture.wav")
            entry = {
                "path": d,
                "name": d.name,
                "duration": info["duration"],
                "samples": info["samples"],
            }
            if in_memory:
                entry["audio"] = {
                    s: load_audio(d / f"{s}.wav")[0] for s in ["mixture"] + SOURCES
                }
            self.tracks.append(entry)

    def __len__(self):
        return len(self.tracks) * self.samples_per_track

    def _read(self, track, source, start_s, dur_s):
        if self.in_memory:
            a = track["audio"][source]
            if dur_s is None:
                return a
            lo = int(start_s * self.sample_rate)
            return a[:, lo: lo + int(dur_s * self.sample_rate)]
        return load_audio(track["path"] / f"{source}.wav", start=start_s, dur=dur_s)[0]

    def __getitem__(self, index: int) -> np.ndarray:
        track = self.tracks[index // self.samples_per_track]

        if self.seq_duration:
            ys = {}
            srcs = []
            for source in SOURCES:
                if self.random_track_mix:
                    track = self.rng.choice(self.tracks)
                dur = min(track["duration"], self.seq_duration)
                if self.fixed_start < 0:
                    start = self.rng.uniform(0, track["duration"] - dur)
                else:
                    start = self.fixed_start
                audio = self._read(track, source, start, dur)
                audio = self.source_augmentations(audio, self.rng)
                n = int(self.seq_duration * self.sample_rate)
                if audio.shape[-1] < n:
                    audio = np.pad(audio, ((0, 0), (0, n - audio.shape[-1])))
                audio = audio[:, :n]
                ys[source] = audio
                srcs.append(audio)
            x = np.sum(srcs, axis=0)
        else:
            x = self._read(track, "mixture", 0, None)
            ys = {s: self._read(track, s, 0, None) for s in SOURCES}

        return np.stack([x, ys["bass"], ys["vocals"], ys["other"], ys["drums"]]).astype(np.float32)


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
        stems = self._tracks[index // self.samples_per_track]
        if self.seq_duration:
            n = int(self.seq_duration * self.sample_rate)
            # max(..., 1): seq_duration == track_duration leaves no slack,
            # randrange(0, 0) would raise
            lo = self.rng.randrange(0, max(stems.shape[-1] - n, 1))
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
    out = np.zeros((len(items), *items[0].shape[:-1], max_len), np.float32)
    for i, it in enumerate(items):
        out[i, ..., : it.shape[-1]] = it
    return out


class DataLoader:
    """Minimal host data loader: shuffling, batching, optional background
    thread prefetch (replaces torch DataLoader workers, training.py:329-338)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False, seed: int = 0, prefetch: int = 2, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            sel = idx[i: i + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            yield pad_collate([self.dataset[int(j)] for j in sel])

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b
