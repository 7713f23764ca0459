"""rav1d_tpu: a TPU-native AV1 decoder (JAX/XLA/Pallas).

From-scratch implementation with the capabilities of dav1d/rav1d; see
DESIGN.md for architecture and SURVEY.md for the behavioral reference map.
"""

__version__ = "0.1.0"

from .decoder import Decoder, Settings, EAgain, DecodeError  # noqa: F401
