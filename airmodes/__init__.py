"""airmodes — a TPU-native Mode S / ADS-B receive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GNU Radio
out-of-tree module gr-air-modes (see SURVEY.md). The demod hot path runs as
one jitted XLA program per IQ block; the decode stack, output plugins, and
apps mirror the reference's Python layers.
"""

from . import constants, exceptions
from .config import Config, DspConfig, OutputConfig, SourceConfig
from .crc import crc24, parity
from .decode.altitude import decode_alt
from .decode.cpr import cpr_decoder
from .decode.parse import AircraftReport, parse

# The DSP symbols import jax (and on this harness, register the TPU
# plugin / claim a chip). Decoder-only hosts — e.g. a zmq SUB feeding the
# output plugins on a machine with no radio or accelerator role — must be
# able to `import airmodes` without that, so they resolve lazily (PEP 562).
_DSP_SYMBOLS = ("DetectionTable", "demod_batch_jit", "demod_block",
                "demod_block_jit")


def __getattr__(name):
    if name in _DSP_SYMBOLS:
        from .dsp import pipeline
        return getattr(pipeline, name)
    raise AttributeError(f"module 'airmodes' has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "AircraftReport", "Config", "DetectionTable", "DspConfig", "OutputConfig",
    "SourceConfig", "constants", "cpr_decoder", "crc24", "decode_alt",
    "demod_batch_jit", "demod_block", "demod_block_jit", "exceptions",
    "parity", "parse",
]
