"""Multi-host path actually exercised: two OS processes rendezvous via
``jax.distributed`` (CPU backend, 2 virtual devices each => 4 global),
build the hosts-outer pixel mesh, and run the data-parallel train step.
The loss must be finite, identical across processes, and bit-identical to
a single-process run on the same number of devices (the train step is
deterministic; BASELINE.md records 4-vs-8-device bit-identity)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")

coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from fypraytracer_tpu.parallel.distributed import (init_distributed,
                                                   pixel_mesh_hosts_outer)
init_distributed(coordinator_address=coord, num_processes=n_proc,
                 process_id=pid)
assert jax.process_count() == n_proc
assert len(jax.devices()) == 2 * n_proc, len(jax.devices())

import jax.numpy as jnp
from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.parallel.shard import make_train_step, replicate_scene
from fypraytracer_tpu.scene.procedural import cornell_box

builder, cam = cornell_box(width=16, height=16, sphere_res=(6, 10))
scene = builder.compile()
mesh = pixel_mesh_hosts_outer()
assert mesh.devices.size == 2 * n_proc
scene = replicate_scene(scene, mesh)
settings = RenderSettings(technique=SamplingTechnique.NEE_MIS, bounces=1,
                          samples=1, sky_color=(0.05, 0.06, 0.08))
step = make_train_step(scene, mesh, 16, 16, settings, lr=0.05)
params = scene.materials
target = jnp.zeros((256, 3), jnp.float32)
losses = []
for i in range(2):
    params, loss = step(params, jnp.asarray(cam.inv_projection),
                        jnp.asarray(cam.inv_view), jnp.uint32(i + 1), target)
    losses.append(float(loss))
print("RESULT " + json.dumps({"pid": pid, "losses": losses}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r["losses"]
    assert set(results) == {0, 1}, f"missing results: {outs}"
    # identical across processes (same global program)
    np.testing.assert_array_equal(results[0], results[1])
    assert all(np.isfinite(results[0]))
    assert results[0][1] < results[0][0], "loss should decrease"

    # bit-identical to a single-process 4-device run
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.parallel.shard import (make_pixel_mesh,
                                                 make_train_step,
                                                 replicate_scene)
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=16, height=16, sphere_res=(6, 10))
    scene = builder.compile()
    mesh = make_pixel_mesh(jax.devices()[:4])
    scene_d = replicate_scene(scene, mesh)
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS, bounces=1,
                              samples=1, sky_color=(0.05, 0.06, 0.08))
    step = make_train_step(scene_d, mesh, 16, 16, settings, lr=0.05)
    params = scene_d.materials
    target = jnp.zeros((256, 3), jnp.float32)
    ref = []
    for i in range(2):
        params, loss = step(params, jnp.asarray(cam.inv_projection),
                            jnp.asarray(cam.inv_view), jnp.uint32(i + 1),
                            target)
        ref.append(float(loss))
    # 2 procs x 2 devices vs 1 proc x 4 devices: the cross-process psum
    # lowers hierarchically, reassociating the reduction -> 1-ulp slack
    np.testing.assert_allclose(results[0], ref, rtol=1e-6)
