"""Neural mask models: per-bucket convolutional denoising autoencoders (CDAE)
and the LSTM variant, assembled into the 4-target Unmix network."""

from .unmix import Unmix
from .cdae import SlicedCDAESpec

__all__ = ["Unmix", "SlicedCDAESpec"]
