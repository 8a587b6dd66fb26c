"""Cadenza CAD1 Task 1 recipe: hearing-aid music enhancement.

Re-design of the reference's cadenza/ package (sevagh/xumx-sliCQ-V2
cadenza/, itself derived from the Clarity CAD1 baseline): demix each song
with the Separator, apply a per-listener NAL-R prescription filter
(+ optional compressor) per stem, write stems (24 kHz) and a stereo remix
(32 kHz), and evaluate with HAAQI.

The clarity library and hydra are not dependencies here: NAL-R, the
compressor, soft clipping, and HAAQI live in cadenza/signal_processing.py /
cadenza/haaqi.py; config is plain YAML loaded into a dataclass
(cadenza/config.py).
"""
