"""xumx-slicq-tpu: TPU-native music demixing framework.

A from-scratch JAX/XLA re-design of the capabilities of sevagh/xumx-sliCQ-V2:
a Bark-scale sliced Constant-Q Transform (sliCQT/NSGT) analysis-synthesis pair,
a per-block convolutional denoising autoencoder mask network for 4-stem
separation (bass/vocals/other/drums), an embedded differentiable multichannel
Wiener-EM post-filter, and X-UMX combination losses -- all running as
jit-compiled, static-shape XLA programs with pjit/shard_map data parallelism
over TPU meshes.

Unlike the reference (PyTorch, Python-looped ragged tensor lists), the
variable-time-resolution frequency blocks are precomputed into a static plan
at trace time; forward/inverse transforms are expressed as batched FFTs plus
precomputed gathers so the whole pipeline compiles to a single XLA program.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Separator":
        from .separator import Separator

        return Separator
    if name == "SliCQT":
        from .ops.slicqt import SliCQT

        return SliCQT
    if name == "Unmix":
        from .models import Unmix

        return Unmix
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
