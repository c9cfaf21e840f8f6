"""Multi-host runtime initialization.

No reference equivalent (supereight is single-process). On a TPU pod
slice each host runs the same program; ``jax.distributed.initialize``
wires the hosts into one runtime so ``jax.devices()`` spans the slice and
the shardings in parallel/sharding.py place collectives on ICI.

Typical launch (one process per host):
  SE_TPU_COORDINATOR=host0:8476 SE_TPU_NUM_PROCESSES=4 \
      python -m supereight_tpu.cli ...
"""

import os

import jax


def initialize_from_env() -> bool:
    """Initialize jax.distributed from SE_TPU_* env vars; no-op when
    unset (single host) or already initialized. Returns multi-host-ness.
    """
    coord = os.environ.get("SE_TPU_COORDINATOR")
    if not coord:
        return False
    n = int(os.environ.get("SE_TPU_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("SE_TPU_PROCESS_ID",
                             os.environ.get("TPU_WORKER_ID", "0")))
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    except RuntimeError:
        # already initialized
        pass
    return n > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def scaling_report(frame_seconds: float, n_frames: int):
    """Frames/s + per-host share for the scaling-efficiency sweep
    (BASELINE.md target: >= 0.8 scaling efficiency across hosts)."""
    fps = n_frames / frame_seconds if frame_seconds > 0 else 0.0
    return {
        "fps": fps,
        "hosts": jax.process_count(),
        "devices": jax.device_count(),
        "fps_per_device": fps / max(jax.device_count(), 1),
    }
