"""Device demod pipeline (the reference's C++ hot path, TPU-native)."""

from .host import BlockStats, table_to_messages
from .pipeline import (DetectionTable, demod_batch_jit, demod_block,
                       demod_block_jit, demod_block_packed_jit,
                       iq_to_device_layout, pack_table, unpack_table)
