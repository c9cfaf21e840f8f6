"""2-process jax.distributed simulation (VERDICT r2 task 9).

Spawns two OS processes, each with 2 virtual CPU devices, wired into one
4-device runtime by parallel/distributed.initialize_from_env (Gloo
collectives). Both run the morton-sharded frame step SPMD; the test
checks the multi-process trajectory matches an in-process 4-device run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_dist_worker.py")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    out = str(tmp_path / "traj.npy")
    env = dict(os.environ)
    env["MP_COORD"] = "127.0.0.1:8976"
    # workers set their own XLA_FLAGS/JAX_PLATFORMS
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2",
         out if pid == 0 else str(tmp_path / "ignored.npy")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    traj_mp = np.load(out)
    blocks = np.load(out + ".blocks.npy")
    assert (blocks > 0).all()

    # in-process 4-device run of the same scene
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.parallel import dist_step

    W, H, DIM = 64, 48, 2.0
    K = (48.0, 48.0, 32.0, 24.0)
    geom_l = MapGeometry(size=64, dim=DIM, capacity=256)
    field = get_field("tsdf")
    depths, poses = synthetic.orbit_sequence(
        6, K, width=W, height=H, radius=0.4 * DIM, center=(DIM / 2,) * 3,
        sphere_radius=0.15 * DIM, angle_span=0.3,
        room=((0.15,) * 3, (DIM - 0.15,) * 3))
    mesh = dist_step.make_mesh(4)
    step = dist_step.make_dist_step(
        mesh, geom_l, field, frame_size=(W, H), iterations=(3, 2),
        mu=0.1, icp_threshold=1e-5, frustum_halo=False)
    state = dist_step.init_dist_state(mesh, geom_l, field, (W, H),
                                      poses[0])
    kj = jnp.asarray(K, jnp.float32)
    traj = []
    for i, d in enumerate(depths):
        state, _ = step(state, jnp.asarray(d), kj, jnp.int32(i))
        traj.append(np.asarray(state.pose))
    np.testing.assert_allclose(traj_mp, np.stack(traj), atol=1e-3)
