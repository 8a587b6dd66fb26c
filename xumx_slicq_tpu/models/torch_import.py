"""Import reference (sevagh/xumx-sliCQ-V2) torch checkpoints into our pytrees.

The reference stores one `_SlicedUnmixCDAE` per bucket in
`Unmix.sliced_umx` (model.py:40-59), each with 4 deep-copied per-target
Sequentials `cdaes.{t}` whose layer indices are:

    0 conv1 (Conv2d / _CausalConv2d)   3 conv2    6 deconv1 (ConvTranspose2d)
    1 bn1                              4 bn2      7 bn3
    9 deconv2 (ConvTranspose2d, bias)  (2,5,8 ReLU; 10 Sigmoid)

plus per-bucket `input_mean` / `input_scale` parameters (model.py:192-203).

The LSTM variant (`_SlicedUnmixLSTM`, model.py:297-472) uses ModuleLists
layer1s/lstms/layer2s/layer3s.

This module is torch-free: it accepts any mapping from state_dict key to
array (e.g. `{k: v.numpy() for k, v in sd.items()}`); `load_torch_params`
handles .pth files when torch is importable.
"""

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from .cdae import NB_TARGETS


def _stack(sd: Mapping, template: str, n=NB_TARGETS):
    return jnp.asarray(np.stack([np.asarray(sd[template.format(t=t)]) for t in range(n)]))


def import_cdae_state_dict(sd: Mapping[str, np.ndarray], n_blocks: int):
    """Reference CDAE Unmix state_dict -> (params, batch_stats) pytrees."""
    params_blocks = []
    stats_blocks = []
    for i in range(n_blocks):
        p = f"sliced_umx.{i}."
        c = p + "cdaes.{t}."

        def bn_params(idx):
            return dict(
                scale=_stack(sd, c + f"{idx}.weight"),
                bias=_stack(sd, c + f"{idx}.bias"),
            )

        def bn_stats(idx):
            return dict(
                mean=_stack(sd, c + f"{idx}.running_mean"),
                var=_stack(sd, c + f"{idx}.running_var"),
            )

        params_blocks.append({
            "enc1_w": _stack(sd, c + "0.weight"),
            "enc2_w": _stack(sd, c + "3.weight"),
            "dec1_w": _stack(sd, c + "6.weight"),
            "dec2_w": _stack(sd, c + "9.weight"),
            "dec2_b": _stack(sd, c + "9.bias"),
            "bn1": bn_params(1),
            "bn2": bn_params(4),
            "bn3": bn_params(7),
            "input_mean": jnp.asarray(np.asarray(sd[p + "input_mean"])),
            "input_scale": jnp.asarray(np.asarray(sd[p + "input_scale"])),
        })
        stats_blocks.append({
            "bn1": bn_stats(1),
            "bn2": bn_stats(4),
            "bn3": bn_stats(7),
        })
    return {"blocks": params_blocks}, {"blocks": stats_blocks}


def import_lstm_state_dict(sd: Mapping[str, np.ndarray], n_blocks: int, downsample_flags):
    """Reference LSTM Unmix state_dict -> (params, batch_stats) pytrees.

    downsample_flags: per-block bool, True when nb_f_bins > 10 (layer1 is a
    Linear+BN rather than Identity)."""
    params_blocks = []
    stats_blocks = []
    for i in range(n_blocks):
        p = f"sliced_umx.{i}."
        blk: Dict = {
            "input_mean": jnp.asarray(np.asarray(sd[p + "input_mean"])),
            "input_scale": jnp.asarray(np.asarray(sd[p + "input_scale"])),
        }
        st: Dict = {}
        if downsample_flags[i]:
            blk["fc1_w"] = _stack(sd, p + "layer1s.{t}.0.weight")
            blk["bn1"] = dict(
                scale=_stack(sd, p + "layer1s.{t}.1.weight"),
                bias=_stack(sd, p + "layer1s.{t}.1.bias"),
            )
            st["bn1"] = dict(
                mean=_stack(sd, p + "layer1s.{t}.1.running_mean"),
                var=_stack(sd, p + "layer1s.{t}.1.running_var"),
            )
        layers = []
        li = 0
        while f"sliced_umx.{i}.lstms.0.weight_ih_l{li}" in sd:
            layer = {
                "w_ih": _stack(sd, p + f"lstms.{{t}}.weight_ih_l{li}"),
                "w_hh": _stack(sd, p + f"lstms.{{t}}.weight_hh_l{li}"),
                "b_ih": _stack(sd, p + f"lstms.{{t}}.bias_ih_l{li}"),
                "b_hh": _stack(sd, p + f"lstms.{{t}}.bias_hh_l{li}"),
            }
            if f"sliced_umx.{i}.lstms.0.weight_ih_l{li}_reverse" in sd:
                layer.update(
                    w_ih_reverse=_stack(sd, p + f"lstms.{{t}}.weight_ih_l{li}_reverse"),
                    w_hh_reverse=_stack(sd, p + f"lstms.{{t}}.weight_hh_l{li}_reverse"),
                    b_ih_reverse=_stack(sd, p + f"lstms.{{t}}.bias_ih_l{li}_reverse"),
                    b_hh_reverse=_stack(sd, p + f"lstms.{{t}}.bias_hh_l{li}_reverse"),
                )
            layers.append(layer)
            li += 1
        blk["lstm"] = layers
        blk["fc2_w"] = _stack(sd, p + "layer2s.{t}.0.weight")
        blk["bn2"] = dict(
            scale=_stack(sd, p + "layer2s.{t}.1.weight"),
            bias=_stack(sd, p + "layer2s.{t}.1.bias"),
        )
        st["bn2"] = dict(
            mean=_stack(sd, p + "layer2s.{t}.1.running_mean"),
            var=_stack(sd, p + "layer2s.{t}.1.running_var"),
        )
        blk["fc3_w"] = _stack(sd, p + "layer3s.{t}.0.weight")
        blk["fc3_b"] = _stack(sd, p + "layer3s.{t}.0.bias")
        params_blocks.append(blk)
        stats_blocks.append(st)
    return {"blocks": params_blocks}, {"blocks": stats_blocks}


def load_torch_params(pth_path: str, n_blocks: int, lstm: bool = False, downsample_flags=None):
    """Load a reference .pth checkpoint (requires torch) and convert."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    if lstm:
        return import_lstm_state_dict(sd, n_blocks, downsample_flags)
    return import_cdae_state_dict(sd, n_blocks)
