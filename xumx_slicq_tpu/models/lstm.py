"""Per-bucket LSTM mask network (UMX-style alternative to the CDAE).

Re-design of `_SlicedUnmixLSTM` (sevagh/xumx-sliCQ-V2 model.py:297-472):
optional Linear down-projection (when >10 frequency bins) + 3-layer
(bi)LSTM + skip concat + 2 Linear layers, x4 targets, sigmoid mask.
`bidirectional = not realtime`.

The reference's row-major reshapes between (B, C, F, frames) and
(rows, F*C) / (frames, B, h1) are replicated literally -- they interleave
axes in a nonstandard but deterministic way, and parity with torch requires
following them exactly.

The LSTM cell follows torch's gate order (i, f, g, o) and weight layout
(W_ih: (4H, in), W_hh: (4H, H)) so state_dicts import 1:1.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .nn import amp_op

NB_TARGETS = 4
NB_LAYERS = 3
DROPOUT = 0.4


@dataclass(frozen=True)
class SlicedLSTMSpec:
    nb_channels: int
    nb_f_bins: int
    nb_t_bins: int
    realtime: bool = False
    # bf16 mixed precision for the large sequence matmuls (input projection
    # + FC layers); the recurrent scan stays fp32 for state stability
    amp: bool = False

    @property
    def downsample(self) -> bool:
        return self.nb_f_bins > 10

    @property
    def hidden_size_1(self) -> int:
        fc = self.nb_f_bins * self.nb_channels
        return fc // 2 if self.downsample else fc

    @property
    def lstm_hidden(self) -> int:
        h1 = self.hidden_size_1
        return h1 if self.realtime else h1 // 2 + (h1 % 2)

    @property
    def odd_lstm(self) -> bool:
        return self.hidden_size_1 % 2 != 0

    @property
    def bidirectional(self) -> bool:
        return not self.realtime


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_lstm_layer(key, input_size: int, hidden: int, bidirectional: bool) -> dict:
    # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases
    bound = (1.0 / hidden) ** 0.5
    dirs = 2 if bidirectional else 1
    keys = jax.random.split(key, 4 * dirs)
    out = {}
    for d in range(dirs):
        sfx = "" if d == 0 else "_reverse"
        out[f"w_ih{sfx}"] = _uniform(keys[4 * d + 0], (4 * hidden, input_size), bound)
        out[f"w_hh{sfx}"] = _uniform(keys[4 * d + 1], (4 * hidden, hidden), bound)
        out[f"b_ih{sfx}"] = _uniform(keys[4 * d + 2], (4 * hidden,), bound)
        out[f"b_hh{sfx}"] = _uniform(keys[4 * d + 3], (4 * hidden,), bound)
    return out


def init_lstm_params(key, spec: SlicedLSTMSpec) -> dict:
    fc = spec.nb_f_bins * spec.nb_channels
    h1 = spec.hidden_size_1
    H = spec.lstm_hidden
    dirs = 2 if spec.bidirectional else 1

    def per_target(k):
        ks = jax.random.split(k, NB_LAYERS + 4)
        p = {}
        if spec.downsample:
            p["fc1_w"] = _uniform(ks[0], (h1, fc), (1.0 / fc) ** 0.5)
        lstm_layers = []
        for l in range(NB_LAYERS):
            in_size = h1 if l == 0 else H * dirs
            lstm_layers.append(_init_lstm_layer(ks[1 + l], in_size, H, spec.bidirectional))
        p["lstm"] = lstm_layers
        p["fc2_w"] = _uniform(ks[-3], (h1, 2 * h1), (1.0 / (2 * h1)) ** 0.5)
        p["fc3_w"] = _uniform(ks[-2], (fc, h1), (1.0 / h1) ** 0.5)
        p["fc3_b"] = _uniform(ks[-1], (fc,), (1.0 / h1) ** 0.5)
        if spec.downsample:
            p["bn1"] = dict(scale=jnp.ones(h1, jnp.float32), bias=jnp.zeros(h1, jnp.float32))
        p["bn2"] = dict(scale=jnp.ones(h1, jnp.float32), bias=jnp.zeros(h1, jnp.float32))
        return p

    keys = jax.random.split(key, NB_TARGETS)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[per_target(k) for k in keys])
    stacked["input_mean"] = jnp.zeros(spec.nb_f_bins, jnp.float32)
    stacked["input_scale"] = jnp.ones(spec.nb_f_bins, jnp.float32)
    return stacked


def init_lstm_batch_stats(spec: SlicedLSTMSpec) -> dict:
    def bn(ch):
        one = dict(
            mean=jnp.zeros(ch, jnp.float32),
            var=jnp.ones(ch, jnp.float32),
        )
        return jax.tree.map(lambda a: jnp.stack([a] * NB_TARGETS), one)

    stats = {"bn2": bn(spec.hidden_size_1)}
    if spec.downsample:
        stats["bn1"] = bn(spec.hidden_size_1)
    return stats


def _batch_norm1d(x, bn_p, bn_s, train: bool, momentum=0.1, eps=1e-5):
    """torch.nn.BatchNorm1d over (rows, features)."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_s = dict(
            mean=(1 - momentum) * bn_s["mean"] + momentum * mean,
            var=(1 - momentum) * bn_s["var"] + momentum * unbiased,
        )
    else:
        mean, var = bn_s["mean"], bn_s["var"]
        new_s = bn_s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * bn_p["scale"] + bn_p["bias"]
    return y, new_s


def _lstm_cell_scan(x_seq, w_ih, w_hh, b_ih, b_hh, reverse: bool = False, amp: bool = False):
    """Run one LSTM direction over x_seq (seq, batch, in) -> (seq, batch, H)."""
    H = w_hh.shape[-1]
    B = x_seq.shape[1]
    # precompute input projections for the whole sequence (one big matmul)
    xp = amp_op(lambda a, b: jnp.einsum("sbi,gi->sbg", a, b), x_seq, w_ih, amp=amp) + b_ih + b_hh

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x_seq.dtype), jnp.zeros((B, H), x_seq.dtype))
    _, hs = jax.lax.scan(step, init, xp, reverse=reverse)
    return hs


def _lstm_forward(x_seq, layers, bidirectional: bool, train: bool, rng: Optional[jax.Array], amp: bool = False):
    """Multi-layer (bi)LSTM, dropout between layers (torch semantics)."""
    out = x_seq
    for li, p in enumerate(layers):
        fwd = _lstm_cell_scan(out, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"], amp=amp)
        if bidirectional:
            bwd = _lstm_cell_scan(
                out, p["w_ih_reverse"], p["w_hh_reverse"], p["b_ih_reverse"], p["b_hh_reverse"],
                reverse=True, amp=amp,
            )
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
        if train and rng is not None and li < len(layers) - 1 and DROPOUT > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - DROPOUT, out.shape)
            out = jnp.where(keep, out / (1.0 - DROPOUT), 0.0)
    return out


def apply_lstm(params: dict, batch_stats: dict, x_mag: jnp.ndarray, spec: SlicedLSTMSpec, train: bool = False, rng: Optional[jax.Array] = None):
    """All-target LSTM mask model for one bucket.

    x_mag: (B, C, F, S, T) -> (masks (4, B, C, F, S, T), new_batch_stats)."""
    B, C, F, S, T = x_mag.shape
    frames = S * T
    fc = F * C
    h1 = spec.hidden_size_1

    x = x_mag.reshape(B, C, F, frames)
    x = (x + params["input_mean"][None, None, :, None]) * params["input_scale"][None, None, :, None]

    # literal reference reshapes (model.py:425-433)
    x_rows = x.reshape(-1, fc)

    target_params = {k: v for k, v in params.items() if k not in ("input_mean", "input_scale")}

    def mm(a, b):
        return amp_op(jnp.matmul, a, b, amp=spec.amp)

    def per_target(p, bn, trng=None):
        new_bn = dict(bn)
        h = x_rows
        if spec.downsample:
            h = mm(h, p["fc1_w"].T)
            h, new_bn["bn1"] = _batch_norm1d(h, p["bn1"], bn["bn1"], train)
            h = jnp.tanh(h)
        h_seq = h.reshape(frames, B, h1)
        lstm_out = _lstm_forward(h_seq, p["lstm"], spec.bidirectional, train, trng, amp=spec.amp)
        h_cat = jnp.concatenate([h_seq, lstm_out], axis=-1)
        h2 = h_cat.reshape(-1, h_cat.shape[-1])
        if spec.odd_lstm:
            h2 = h2[..., :fc]
        h2 = mm(h2, p["fc2_w"].T)
        h2, new_bn["bn2"] = _batch_norm1d(h2, p["bn2"], bn["bn2"], train)
        h2 = jax.nn.relu(h2)
        h3 = jax.nn.sigmoid(mm(h2, p["fc3_w"].T) + p["fc3_b"])
        return h3, new_bn

    if train and rng is not None:
        # independent dropout masks per target, as in torch where each
        # target owns its own nn.LSTM(dropout=0.4) (reference model.py:345)
        masks, new_stats = jax.vmap(per_target)(
            target_params, batch_stats, jax.random.split(rng, NB_TARGETS)
        )
    else:
        masks, new_stats = jax.vmap(lambda p, bn: per_target(p, bn, None))(
            target_params, batch_stats
        )
    masks = masks.reshape(NB_TARGETS, B, C, F, S, T)
    return masks, new_stats
