"""Tracing/profiling hooks (SURVEY.md §5.1) + modes_rx --profile."""

import os

import numpy as np

from airmodes.utils.profiling import RateMeter, trace


def test_trace_captures_jax_profile(tmp_path):
    import jax
    import jax.numpy as jnp
    d = str(tmp_path / "trace")
    with trace(d):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no trace artifacts written"


def test_trace_noop_without_logdir():
    with trace(None):
        pass
    with trace(""):
        pass


def test_rate_meter_intervals():
    m = RateMeter()
    m.add(2_000_000)
    m.add(2_000_000)
    r = m.interval()
    assert r["blocks"] == 2 and r["msps"] > 0
    assert r["avg_msps"] > 0
    # second interval counts only new samples
    m.add(1_000_000)
    r2 = m.interval()
    assert r2["blocks"] == 3


def test_cli_profile_flag(tmp_path):
    """modes_rx --profile writes a trace around the run loop."""
    from airmodes.apps.modes_rx import main
    from airmodes.testing import encoder
    frames = encoder.random_df17_frames(4, seed=70)
    iq, _ = encoder.make_capture(frames, snr_db=22.0, spacing=9000,
                                 seed=70, total_samples=1 << 16)
    cap = str(tmp_path / "p.c64")
    iq.tofile(cap)
    d = str(tmp_path / "prof")
    rc = main(["-s", cap, "--block-size", "65536", "-n",
               "--stats-interval", "0", "--profile", d])
    assert rc == 0
    files = [f for _, _, fs in os.walk(d) for f in fs]
    assert files, "no profile artifacts"
