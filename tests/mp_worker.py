"""jax.distributed multi-process worker (launched by test_multiprocess.py).

Each process owns half of a (1 channel x 8 time) CPU mesh (4 local virtual
devices per process), drives the SAME capture through PodPipeline, and
prints ONLY the wire messages for the time shards it owns (the
addressable_shards branch of PodPipeline._emit) — the jax.distributed
analog of the reference's per-machine zmq fan-out
(python/zmq_socket.py tcp:// cross-machine story).

Usage: python mp_worker.py <coordinator> <num_processes> <process_id>
"""

import json
import sys


def main() -> int:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from airmodes.dist import multihost
    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 8 // nproc

    import numpy as np
    from airmodes.config import DspConfig
    from airmodes.testing import encoder

    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    pipe = multihost.PodPipeline(cfg, n_channel=1, n_time=8)
    S = pipe.samples_per_step
    frames = encoder.random_df17_frames(10, seed=77)
    # traffic throughout the step PLUS a tail so a second (padded) step runs
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=S // 12,
                                     seed=77, total_samples=S + 4321)
    msgs = [m for out in pipe.run_stream([iq[None, :]]) for m in out]
    print(json.dumps({"pid": pid, "msgs": msgs,
                      "want": sorted(t.hex for t in truth)}), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
