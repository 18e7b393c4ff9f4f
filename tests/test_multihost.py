"""True multi-process (multi-host analogue) execution via jax.distributed.

Two OS processes x 4 virtual CPU devices form an 8-device global mesh; the
swarm farm shards 8 swarms 4+4 across them and each process writes only
its addressable swarms.  Regression: fetching per-swarm slices must go
through process-local shards — indexing a non-fully-addressable global
array out-of-jit was observed to double-count across processes.
"""

import pathlib
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np, jax.numpy as jnp
    from lightdock_tpu.engine.energy_batch import build_batch_params
    from lightdock_tpu.engine.gso_jax import device_params
    from lightdock_tpu.parallel.mesh import make_mesh
    from lightdock_tpu.parallel.multihost import (stack_swarm_states,
                                                  swarm_randoms,
                                                  write_swarm_outputs)
    from lightdock_tpu.parallel.sharded import run_multi_swarm
    from lightdock_tpu.scoring.models import DockingModel
    from lightdock_tpu.scoring.potentials import synthetic_potential

    rng = np.random.RandomState(3)
    def model(n):
        return DockingModel(method="dfire",
                            coordinates=rng.uniform(-8, 8, (n, 3)),
                            num_anm=0, nmodes=np.zeros((0, n, 3)),
                            membrane=np.zeros(0, dtype=np.int64),
                            active_restraints={{}}, passive_restraints={{}},
                            atom_types=rng.randint(0, 168, n).astype(np.int32))
    params = build_batch_params(model(40), model(25), False, dtype=np.float64,
                                potential=synthetic_potential())
    G, S, STEPS = 16, 8, 5
    pos = np.concatenate([rng.uniform(-3, 3, (G, 3)),
                          rng.standard_normal((G, 4))], axis=1)
    pos[:, 3:7] /= np.linalg.norm(pos[:, 3:7], axis=1, keepdims=True)
    mesh = make_mesh(n_swarm=8, n_atoms=1)
    states = stack_swarm_states([pos] * S, False, 0, 0, jnp.float64)
    randoms = swarm_randoms(324324, STEPS, S, G)
    final, outs = run_multi_swarm(mesh, device_params(params, np.float64),
                                  states, jnp.asarray(randoms, jnp.float64))
    write_swarm_outputs(outs, list(range(S)), False, STEPS, outdir,
                        swarm_axis=0)
    jax.distributed.shutdown()
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_swarm_farm(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO_ROOT))

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outputs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-2000:]
        assert "WORKER_OK" in out

    # All 8 swarm dirs exist; each process wrote its own half.
    files = sorted(tmp_path.glob("swarm_*/gso_1.out"))
    assert len(files) == 8
    contents = [f.read_text() for f in files]
    # Same stream per swarm => identical trajectories, incl. across the
    # process boundary (swarm_0 from p0 vs swarm_7 from p1).
    assert all(c == contents[0] for c in contents)
    # The written poses are the true per-swarm values (the double-count
    # regression produced exactly 2x poses).
    first_line = contents[0].splitlines()[1]
    vals = [float(v) for v in first_line.split("(")[1].split(")")[0].split(",")]
    qnorm = np.linalg.norm(vals[3:7])
    assert 0.9 < qnorm < 1.1, f"pose scaled wrongly (|q|={qnorm})"
