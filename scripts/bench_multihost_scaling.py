#!/usr/bin/env python3
"""Multi-host weak-scaling efficiency artifact (BASELINE.md north-star:
1 chip -> 1 host -> >=2 hosts).

Swarms are embarrassingly parallel (zero cross-device traffic during
optimization, parallel/farm.py), so the farm's multi-host weak scaling
should be near-perfect.  This measures it with REAL multi-process
execution (jax.distributed over two OS processes, the same machinery a
2-host TPU pod slice uses), on virtual CPU devices:

  1 process  x D devices, S =  2*D swarms   -> per-device throughput T1
  2 processes x D devices, S = 4*D swarms   -> per-device throughput T2

efficiency = T2 / T1.  Writes HOSTSCALING_r03.json at the repo root.

Each process is pinned to its own physical core (taskset) and the
1-process baseline to one core, so every "host" has identical CPU
resources — the measurement isolates the farm's distributed overhead
(jax.distributed coordination, global-mesh bookkeeping) rather than CPU
oversubscription of this 2-core machine.  On real multi-host TPU slices
the per-host resources are disjoint by construction.
"""
from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys
import textwrap

ROOT = pathlib.Path(__file__).resolve().parent.parent
DEVICES_PER_PROC = 4
STEPS = 30
G = 50

WORKER = textwrap.dedent("""
    import os, sys, time
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count={dev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    nproc = int(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
    if nproc > 1:
        jax.distributed.initialize(coordinator_address="localhost:" + port,
                                   num_processes=nproc, process_id=pid)
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    import __graft_entry__ as ge
    from lightdock_tpu.parallel.farm import SwarmFarmRunner

    params, pos, _ = ge._toy_system(n_rec=300, n_lig=100, g={g})
    S = 2 * len(jax.devices())   # 2 swarms per global device
    runner = SwarmFarmRunner(params, [pos] * S, list(range(S)), seed=324324,
                             use_anm=False, anm_rec=0, anm_lig=0,
                             dtype=jnp.float32, output_root=None,
                             energy_mode="xla")
    def fetch():
        # Force completion via process-LOCAL shards (a global sharded array
        # spanning both processes cannot be np.asarray'd directly).
        arr = jax.tree_util.tree_leaves(runner.states)[0]
        for s in arr.addressable_shards:
            np.asarray(s.data)

    states0 = runner.states
    runner.run_segmented({steps}, segment={steps})   # compile+warm
    fetch()
    best = 1e9
    for _ in range(3):
        runner._start_step, runner.states = 0, states0
        t0 = time.time()
        runner.run_segmented({steps}, segment={steps})
        fetch()
        best = min(best, time.time() - t0)
    poses = S * {g} * {steps}
    print("WORKER_RESULT", pid, poses / best / len(jax.devices()), flush=True)
    if nproc > 1:
        jax.distributed.shutdown()
""").format(repo=str(ROOT), dev=DEVICES_PER_PROC, g=G, steps=STEPS)


def run_config(nproc: int) -> float:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = ROOT / "scripts" / "_hostscale_worker.py"
    script.write_text(WORKER)
    procs = [subprocess.Popen(
        ["taskset", "-c", str(pid % max(1, os.cpu_count())),
         sys.executable, str(script), str(nproc), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    vals = []
    for p in procs:
        out = p.communicate(timeout=900)[0]
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT"):
                vals.append(float(line.split()[2]))
    assert len(vals) == nproc
    return sum(vals) / len(vals)  # mean per-device poses/s


def main():
    t1 = run_config(1)
    print(f"1 process  x {DEVICES_PER_PROC} dev: {t1:.0f} poses/s/device",
          flush=True)
    t2 = run_config(2)
    print(f"2 processes x {DEVICES_PER_PROC} dev: {t2:.0f} poses/s/device",
          flush=True)
    eff = t2 / t1
    artifact = {
        "config": {"devices_per_process": DEVICES_PER_PROC,
                   "swarms_per_device": 2, "glowworms": G, "steps": STEPS,
                   "backend": "cpu-virtual (jax.distributed, 2 OS processes,"
                              " one pinned core per process)"},
        "per_device_poses_per_s": {"1_process": round(t1, 1),
                                   "2_processes": round(t2, 1)},
        "weak_scaling_efficiency": round(eff, 4),
    }
    out = ROOT / "HOSTSCALING_r03.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"efficiency={eff:.3f} -> {out}", flush=True)


if __name__ == "__main__":
    main()
