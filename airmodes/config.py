"""Configuration dataclasses mirroring the reference's option surface.

The reference's entire config surface is the optparse option set of
apps/modes_rx (SURVEY.md §2.5/§5.6): source selection, channel rate, gain,
frequency, detection threshold, output plugin switches, receiver location.
Here that becomes typed dataclasses; apps/modes_rx.py builds one from argparse.

DSP-specific knobs that the reference hard-codes in C++ (pulse/quiet
tolerances, noise window) are exposed explicitly since the TPU pipeline is
config-driven and jit-specialized on `DspConfig` (hashable, frozen).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .constants import CHIP_RATE, MAX_EVENT_CHIPS


@dataclasses.dataclass(frozen=True)
class DspConfig:
    """Static (jit-specialization) parameters of the demod pipeline."""

    channel_rate: float = 2e6          # samples/s after any resampling
    threshold_db: float = 5.0          # preamble detection threshold over noise floor
    block_size: int = 1 << 20          # owned samples per device block
    max_detections: int = 128          # fixed-capacity detection table per block
    noise_window: int = 128            # trailing moving-average window (samples)
    pulse_tolerance: float = 0.25      # pulse power >= tol * reference level (~6 dB)
    quiet_tolerance: float = 0.5       # quiet chip power < tol * reference level (~3 dB)
    max_lowconf_bits: int = 5          # ECC attempted only if #low-confidence <= this
    confidence_level: float = 0.5      # chip "on" if power > level * reference
    nms_chips: int = 2                 # non-max suppression half-window (chips)
    # perf knob (decision-equivalent): compute the kernel's trailing
    # noise-window sum as two MXU matmuls instead of the 7-step shifted-add
    # chain on the VPU (~3% faster detect, measured decision-identical).
    # Changes f32 summation order only.
    mxu_window_sum: bool = True

    @property
    def sps(self) -> int:
        """Integer samples per chip (channel_rate must be a multiple of 2 Msps)."""
        sps = int(round(self.channel_rate / CHIP_RATE))
        if sps < 1 or abs(sps * CHIP_RATE - self.channel_rate) > 1e-3:
            raise ValueError(
                f"channel_rate {self.channel_rate} is not an integer multiple of "
                f"{CHIP_RATE}; resample first (airmodes.resample)")
        return sps

    @property
    def threshold(self) -> float:
        """Linear power ratio for the dB threshold (ref: powf(10, db/10))."""
        return 10.0 ** (self.threshold_db / 10.0)

    @property
    def left_halo(self) -> int:
        """Samples of left context a block needs: the noise window plus one
        extra 128-sample row of lookback (peak/NMS lookback). Row alignment
        for the Pallas DMA windows holds when noise_window is a multiple of
        128 — the kernels assert noise_window == 128; other values are
        valid for the jnp pipeline only."""
        if self.noise_window <= 0:
            raise ValueError(f"noise_window must be > 0, got "
                             f"{self.noise_window}")
        return self.noise_window + 128

    @property
    def right_halo(self) -> int:
        """Samples of right context (preamble + longest frame + peak lookahead)."""
        return (MAX_EVENT_CHIPS + 2) * self.sps


@dataclasses.dataclass(frozen=True)
class SourceConfig:
    """Where IQ samples come from (ref: modes_rx -s / radio.py _setup_source)."""

    kind: str = "file"                 # file | udp | synthetic | uhd | osmocom
    path: Optional[str] = None         # for file sources (complex64 interleaved)
    udp_host: str = "0.0.0.0"
    udp_port: int = 10000
    udp_timeout_s: float = 0.0         # 0 = survive feeder restarts
    sample_rate: float = 2e6           # raw source rate (resampled to channel_rate)
    center_freq: float = 1090e6
    gain: Optional[float] = None
    antenna: Optional[str] = None
    freq_corr_ppm: float = 0.0
    throttle: bool = False             # real-time throttle for file replay
    pps_sync: bool = False             # mlat-grade time sync (hardware sources)


@dataclasses.dataclass(frozen=True)
class OutputConfig:
    """Which output plugins are enabled (ref: modes_rx -P/-K/-d/-w/-m/-n/-l)."""

    print_console: bool = True
    sbs1_port: Optional[int] = None       # 30003 typical
    kml_file: Optional[str] = None
    sqlite_db: Optional[str] = None
    raw_port: Optional[int] = None        # raw hex TCP feed
    flightgear: Optional[str] = None      # host:port
    location: Optional[Tuple[float, float, float]] = None  # lat, lon, alt_m


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the sharded pipeline (SURVEY.md §2.7)."""

    channel_axis: int = 1              # data parallel over SDR channels
    time_axis: int = 1                 # sequence parallel over time blocks
    axis_names: Tuple[str, str] = ("channel", "time")


@dataclasses.dataclass(frozen=True)
class Config:
    dsp: DspConfig = dataclasses.field(default_factory=DspConfig)
    source: SourceConfig = dataclasses.field(default_factory=SourceConfig)
    output: OutputConfig = dataclasses.field(default_factory=OutputConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
