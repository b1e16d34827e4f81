"""REAL multi-process jax.distributed execution on localhost.

SURVEY.md §4: "Multi-host logic is testable without a pod via
xla_force_host_platform_device_count and jax.distributed multi-process on
localhost." This launches 2 coordinator-connected processes, each owning 4
of the 8 virtual CPU devices, and checks that the union of the per-host
emitted message sets equals the ground truth with no duplicates —
exercising PodPipeline._emit's addressable_shards branch, which is dead
code under the single-process suite. (Ref: python/zmq_socket.py ~30
tcp:// cross-machine fan-out.)
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from airmodes.config import DspConfig

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_union_matches_truth():
    # (no pytest-timeout in this env; the communicate(timeout=240) below
    # bounds the run)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, _WORKER, coord, "2", str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o["msgs"] for o in outs}
    assert set(by_pid) == {0, 1}
    want = set(outs[0]["want"])

    # each process emitted only messages from its OWN time shards:
    # process 0 owns devices 0-3 = time shards 0-3 (first half of the step)
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    half_s = 4 * cfg.block_size / cfg.channel_rate
    step_s = 8 * cfg.block_size / cfg.channel_rate
    for pid, msgs in by_pid.items():
        assert msgs, f"process {pid} emitted nothing"
        for m in msgs:
            ts = float(m.split()[5]) % step_s
            owner = 0 if ts < half_s else 1
            assert owner == pid, (pid, m)

    # union across hosts == ground truth, with no cross-host duplicates
    all_msgs = by_pid[0] + by_pid[1]
    assert len(all_msgs) == len(set(all_msgs)), "duplicate emission"
    got = {m.split()[1] for m in all_msgs}
    assert want <= got, want - got
