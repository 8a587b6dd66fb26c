"""Data layer tests: wav I/O round-trip, preprocessing, datasets, loader."""

import numpy as np
import pytest

from xumx_slicq_tpu import data as D


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 5000)) * 0.3).astype(np.float32)
    p = tmp_path / "x.wav"
    D.save_audio(p, audio, 44100)
    back, sr = D.load_audio(p)
    assert sr == 44100
    np.testing.assert_allclose(back, audio, atol=1e-6)
    info = D.load_info(p)
    assert info["samples"] == 5000 and info["channels"] == 2


def test_load_audio_segment(tmp_path):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 44100)).astype(np.float32)
    p = tmp_path / "y.wav"
    D.save_audio(p, audio, 44100)
    seg, _ = D.load_audio(p, start=0.5, dur=0.25)
    np.testing.assert_allclose(seg, audio[:, 22050: 22050 + 11025], atol=1e-6)


def test_preprocess_audio_shapes():
    mono = np.zeros(1000, np.float32)
    assert D.preprocess_audio(mono).shape == (1, 2, 1000)
    st = np.zeros((2, 1000), np.float32)
    assert D.preprocess_audio(st).shape == (1, 2, 1000)
    tn = np.zeros((1000, 2), np.float32)  # (time, ch) orientation
    assert D.preprocess_audio(tn[None]).shape == (1, 2, 1000)


def test_preprocess_resample():
    t = np.arange(22050) / 22050
    sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = D.preprocess_audio(np.stack([sig, sig]), rate=22050, model_rate=44100)
    assert out.shape == (1, 2, 44100)


def _make_tree(tmp_path, subset, names, n=8000):
    rng = np.random.default_rng(0)
    for name in names:
        d = tmp_path / subset / name
        d.mkdir(parents=True)
        stems = {s: (rng.standard_normal((2, n)) * 0.2).astype(np.float32) for s in D.SOURCES}
        mix = sum(stems.values())
        D.save_audio(d / "mixture.wav", mix, 44100)
        for s, a in stems.items():
            D.save_audio(d / f"{s}.wav", a, 44100)


def test_track_tree_dataset(tmp_path):
    _make_tree(tmp_path, "train", ["trackA", "trackB", D.MUSDB_VALIDATION_TRACKS[0]])
    train = D.TrackTreeDataset(tmp_path, split="train", seq_duration=0.05, samples_per_track=2)
    valid = D.TrackTreeDataset(tmp_path, split="valid", seq_duration=None, samples_per_track=1)
    assert len(train.tracks) == 2  # validation track excluded
    assert len(valid.tracks) == 1
    item = train[0]
    assert item.shape == (5, 2, int(0.05 * 44100))
    # mix equals sum of stems when no augmentation
    np.testing.assert_allclose(item[0], item[1:].sum(0), atol=1e-5)
    full = valid[0]
    assert full.shape == (5, 2, 8000)


def test_synthetic_dataset_and_loader():
    ds = D.SyntheticDataset(n_tracks=2, seq_duration=0.1, samples_per_track=3)
    assert len(ds) == 6
    item = ds[0]
    assert item.shape[0] == 5 and item.shape[1] == 2
    loader = D.DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0].shape == (4, 5, 2, item.shape[-1])


def test_synthetic_dataset_seq_equals_track_duration():
    """seq_duration == track_duration leaves zero chunking slack; the
    random offset must degrade to 0 rather than raise (VERDICT r2 weak 6)."""
    ds = D.SyntheticDataset(n_tracks=1, seq_duration=0.5, track_duration=0.5, samples_per_track=2)
    item = ds[0]
    assert item.shape == (5, 2, int(0.5 * 44100))


def test_load_audio_int16_exact(tmp_path):
    """PCM_16 loads through the fused single-pass path bit-identically to
    the float64 reference route (1/32768 is exact in binary)."""
    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal((1000, 2)) * 8000).astype(np.int16)
    wavfile.write(tmp_path / "p.wav", 44100, pcm)
    a, sr = D.load_audio(tmp_path / "p.wav")
    assert sr == 44100 and a.dtype == np.float32 and a.shape == (2, 1000)
    ref = (pcm.astype(np.float64) / 32768.0).astype(np.float32).T
    np.testing.assert_array_equal(a, ref)
    seg, _ = D.load_audio(tmp_path / "p.wav", start=0.005, dur=0.005)
    np.testing.assert_array_equal(seg, ref[:, 220:440])


def _loader_over_tree(tmp_path, workers, prefetch=0, seed=7):
    ds = D.TrackTreeDataset(
        tmp_path, split="train", seq_duration=0.05, samples_per_track=4,
        source_augmentations=D.aug_from_str(["gain", "channelswap"]),
        random_track_mix=True, seed=11,
    )
    return D.DataLoader(ds, batch_size=4, shuffle=True, seed=seed,
                        workers=workers, prefetch=prefetch)


def test_loader_workers_deterministic(tmp_path):
    """Item seeds derive from (loader seed, epoch, batch, item) position, so
    the data stream is identical for ANY worker count — including the
    serial workers=0 path — and across runs."""
    _make_tree(tmp_path, "train", ["trackA", "trackB"])

    a = list(_loader_over_tree(tmp_path, workers=0))
    b = list(_loader_over_tree(tmp_path, workers=2))
    c = list(_loader_over_tree(tmp_path, workers=3))
    assert len(a) == 2 and a[0].shape == (4, 5, 2, int(0.05 * 44100))
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)
    # items keep the mix == sum-of-stems invariant modulo augment gains
    # applied per stem (mix is assembled from the augmented stems)
    np.testing.assert_allclose(a[0][:, 0], a[0][:, 1:].sum(1), atol=1e-5)


def test_loader_abandoned_epoch_deterministic(tmp_path):
    """Abandoning an epoch early (the --max-batches-per-epoch pattern, with
    prefetch threads in flight) must not perturb later epochs' data, and
    the prefetch producer thread must unblock and exit."""
    import threading

    _make_tree(tmp_path, "train", ["trackA", "trackB"])

    full = _loader_over_tree(tmp_path, workers=2, prefetch=2)
    list(full)                      # epoch 0 fully consumed
    ref_epoch1 = list(full)

    ab = _loader_over_tree(tmp_path, workers=2, prefetch=2)
    next(iter(ab))                  # epoch 0 abandoned after one batch
    got_epoch1 = list(ab)

    for x, y in zip(ref_epoch1, got_epoch1):
        np.testing.assert_array_equal(x, y)

    # no leaked producer threads blocked in q.put (pool workers persist by
    # design; only the named prefetch producers must be gone)
    import time
    def prefetchers():
        return [t for t in threading.enumerate() if t.name == "slicq-prefetch"]
    deadline = time.time() + 6.0
    while time.time() < deadline and prefetchers():
        time.sleep(0.1)
    assert not prefetchers()


def test_loader_slow_consumer_terminates(tmp_path):
    """Epoch-end sentinel delivery must wait out a full prefetch queue
    (regression: put_nowait dropped the sentinel whenever the consumer was
    slower than the producer, hanging the training loop in q.get())."""
    import threading
    import time

    _make_tree(tmp_path, "train", ["trackA", "trackB"])
    loader = _loader_over_tree(tmp_path, workers=2, prefetch=1)
    done = []

    def consume():
        for _ in loader:
            time.sleep(0.4)  # queue fills; producer finishes first
        done.append(True)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=20.0)
    assert done, "loader iteration hung after the last batch"


def test_crop_to_float32_uint8_and_unknown(tmp_path):
    """The shared crop converter keeps uint8 offset handling and rejects
    unknown dtypes on every path (regression: the fused crop path once
    returned raw 0..255 uint8 values unscaled)."""
    u8 = np.array([[0, 255], [128, 128]], np.uint8)  # (samples, C)
    out = D._crop_to_float32(u8)
    np.testing.assert_allclose(out, [[-1.0, 0.0], [127 / 128, 0.0]])
    with pytest.raises(ValueError):
        D._crop_to_float32(np.zeros((4, 2), np.int64))


def test_pad_collate():
    items = [np.ones((5, 2, 10), np.float32), np.ones((5, 2, 7), np.float32)]
    out = D.pad_collate(items)
    assert out.shape == (2, 5, 2, 10)
    assert out[1, :, :, 7:].sum() == 0


def test_augmentations():
    import random

    rng = random.Random(0)
    a = np.ones((2, 100), np.float32)
    g = D._augment_gain(a, rng)
    assert 0.25 <= g[0, 0] <= 1.25
    aug = D.aug_from_str(["gain", "channelswap"])
    out = aug(np.stack([np.zeros(10), np.ones(10)]).astype(np.float32), rng)
    assert out.shape == (2, 10)


def test_folded_augmentation_matches_generic_chain(tmp_path):
    """_fill_item's folded fast path (gain folded into the PCM multiply,
    channelswap into the transpose view) hand-duplicates the RNG draw
    protocol and distributions of _augment_gain/_augment_channelswap.
    This ties the two copies together: identical items, bit for bit, for
    identical seeds — so editing one path without the other fails here."""
    _make_tree(tmp_path, "train", ["trackA", "trackB"])
    folded = D.TrackTreeDataset(
        tmp_path, split="train", seq_duration=0.05, samples_per_track=4,
        source_augmentations=D.aug_from_str(["gain", "channelswap"]),
    )
    chain = D.aug_from_str(["gain", "channelswap"])
    assert chain.canonical_fold
    chain.canonical_fold = False  # same fns, forced down the generic path
    generic = D.TrackTreeDataset(
        tmp_path, split="train", seq_duration=0.05, samples_per_track=4,
        source_augmentations=chain,
    )
    assert len(folded) == len(generic) > 0
    for index in range(len(folded)):
        for seed in (0, 123):
            np.testing.assert_array_equal(
                folded.getitem_seeded(index, seed),
                generic.getitem_seeded(index, seed),
            )
