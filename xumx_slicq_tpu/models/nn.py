"""Minimal functional NN primitives with torch-compatible semantics.

Hand-rolled (no flax modules) so parameters are plain pytrees that can be
(a) imported 1:1 from the reference's torch state_dicts and (b) stacked and
vmapped across the 4 separation targets -- one grouped XLA conv instead of
4 Python-dispatched ones.

Conventions: conv inputs are NCHW, conv weights OIHW (torch layout),
transposed-conv weights IOHW (torch ConvTranspose2d layout).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def amp_op(op, *operands, amp: bool):
    """bf16 mixed-precision boundary (TPU-native equivalent of the
    reference's torch.autocast(bf16) scope, training.py:69-70): when amp,
    OPERANDS are cast to bf16 — the MXU's native input width, which
    accumulates in fp32 internally — and the result is cast back to fp32
    for the surrounding BN/elementwise chain. The cast-in/cast-out pair
    keeps forward AND backward convs/matmuls uniformly bf16 (a mixed
    bf16-operand/fp32-cotangent conv is ill-typed in XLA). Master weights,
    BN, Wiener-EM, and losses remain fp32."""
    if not amp:
        return op(*operands)
    return op(*(o.astype(jnp.bfloat16) for o in operands)).astype(jnp.float32)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int] = (1, 1), amp: bool = False) -> jnp.ndarray:
    """torch.nn.functional.conv2d, padding=0 (valid)."""
    def run(x, w):
        return lax.conv_general_dilated(
            x, w,
            window_strides=stride,
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    return amp_op(run, x, w, amp=amp)


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int] = (1, 1), amp: bool = False) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose2d, padding=0.

    w has torch layout (in_ch, out_ch, kh, kw). Implemented as the gradient
    of a strided conv: insert (stride-1) zeros between inputs and convolve
    with the flipped kernel.
    """
    # to OIHW with flipped spatial dims: (out, in, kh, kw)
    w_t = jnp.flip(jnp.swapaxes(w, 0, 1), axis=(-2, -1))
    kh, kw = w.shape[-2], w.shape[-1]

    def run(x, w_t):
        return lax.conv_general_dilated(
            x, w_t,
            window_strides=(1, 1),
            padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
            lhs_dilation=stride,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    return amp_op(run, x, w_t, amp=amp)


def batch_norm(
    x: jnp.ndarray,
    bn_params: dict,
    bn_stats: dict,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """torch.nn.BatchNorm2d over NCHW (stats per channel axis 1).

    bn_params = {scale, bias} (trainable affine); bn_stats = {mean, var}
    (running statistics). Returns (y, new_stats). In train mode batch stats
    normalize and the running estimate is updated with torch's convention
    (unbiased variance in the running buffer, biased in the normalization)."""
    if train:
        axes = (0, 2, 3)
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = dict(
            mean=(1 - momentum) * bn_stats["mean"] + momentum * mean,
            var=(1 - momentum) * bn_stats["var"] + momentum * unbiased,
        )
    else:
        mean, var = bn_stats["mean"], bn_stats["var"]
        new_stats = bn_stats
    inv = lax.rsqrt(var + eps)
    y = (x - mean[None, :, None, None]) * (inv * bn_params["scale"])[None, :, None, None]
    y = y + bn_params["bias"][None, :, None, None]
    return y, new_stats


def init_bn_params(channels: int) -> dict:
    return dict(
        scale=jnp.ones(channels, jnp.float32),
        bias=jnp.zeros(channels, jnp.float32),
    )


def init_bn_stats(channels: int) -> dict:
    return dict(
        mean=jnp.zeros(channels, jnp.float32),
        var=jnp.ones(channels, jnp.float32),
    )


def kaiming_uniform_conv(key, shape):
    """torch Conv2d default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-sqrt(1/fan_in), sqrt(1/fan_in)) with fan_in = in_ch * kh * kw.

    For ConvTranspose2d (IOHW layout) torch computes fan_in from dim 1
    (out_ch * kh * kw); pass the layout-appropriate shape."""
    fan_in = shape[1] * shape[2] * shape[3]
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
