"""Cadenza recipe configuration: plain YAML -> namespace (no hydra).

Schema mirrors the reference's cadenza/config.yaml (paths, sample rates,
NAL-R + compressor parameters, batch sharding knobs)."""

import copy
from pathlib import Path
from types import SimpleNamespace

import yaml

DEFAULT_CONFIG = {
    "path": {
        "root": "/CADENZA/cad1/task1",
        "metadata_dir": "{root}/metadata",
        "music_dir": "/MUSDB18-HQ",
        "music_train_file": "{metadata_dir}/musdb18.train.json",
        "music_valid_file": "{metadata_dir}/musdb18.valid.json",
        "listeners_train_file": "{metadata_dir}/listeners.train.json",
        "listeners_valid_file": "{metadata_dir}/listeners.valid.json",
        "music_test_file": "{metadata_dir}/musdb18.test.json",
        "music_segments_test_file": "{metadata_dir}/musdb18.segments.test.json",
        "listeners_test_file": "{metadata_dir}/listeners.test.json",
        "exp_folder": "/exp",
    },
    "team_id": "T001",
    "sample_rate": 44100,
    "stem_sample_rate": 24000,
    "remix_sample_rate": 32000,
    "nalr": {"nfir": 220, "fs": 44100},
    "apply_compressor": False,
    "compressor": {
        "threshold": 0.35,
        "attenuation": 0.1,
        "attack": 50,
        "release": 1000,
        "rms_buffer_size": 0.064,
    },
    "soft_clip": True,
    "separator": {
        "model": "xumx_slicq_tpu",
        "model_path": None,
        "runtime_backend": "jax-auto",
    },
    "evaluate": {
        "set_random_seed": True,
        "small_test": False,
        "batch_size": 1,
        "batch": 0,
    },
}


def _ns(d):
    if isinstance(d, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def _interp_paths(paths: dict) -> dict:
    out = dict(paths)
    for _ in range(3):
        for k, v in out.items():
            if isinstance(v, str):
                out[k] = v.format(**{kk: vv for kk, vv in out.items() if isinstance(vv, str)})
    return out


def load_config(yaml_path: str = None, overrides: dict = None) -> SimpleNamespace:
    cfg = copy.deepcopy(DEFAULT_CONFIG)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    if yaml_path:
        if not Path(yaml_path).exists():
            raise FileNotFoundError(f"config file not found: {yaml_path}")
        with open(yaml_path) as f:
            merge(cfg, yaml.safe_load(f) or {})
    if overrides:
        merge(cfg, overrides)
    cfg["path"] = _interp_paths(cfg["path"])
    return _ns(cfg)
