#!/usr/bin/env python3
"""Multi-host weak-scaling efficiency artifact (BASELINE.md north-star:
1 chip -> 1 host -> >=2 hosts).

Swarms are embarrassingly parallel (zero cross-device traffic during
optimization, parallel/farm.py), so the farm's multi-host weak scaling
should be near-perfect.  This measures it with REAL multi-process
execution (jax.distributed over two OS processes, the same machinery a
2-host TPU pod slice uses), on virtual CPU devices:

  1 process  x D devices, S = 2*D swarms            -> T1 per-device
  2 INDEPENDENT processes x D devices (no
     jax.distributed; each its own farm)            -> T2i per-device
  2 DISTRIBUTED processes x D devices (one global
     mesh via jax.distributed)                      -> T2d per-device

distributed_efficiency = T2d / T2i isolates the farm's multi-host
overhead (jax.distributed coordination, global-mesh bookkeeping) from
plain machine saturation: both T2d and T2i saturate this 2-core machine
identically (each process pinned to its own core), so their ratio is the
part that would survive on real multi-host TPU slices, where per-host
resources are disjoint by construction.  raw_efficiency = T2d / T1 is
also recorded (it under-reports on a shared 2-core box: the 1-process
baseline leaves a core free to absorb OS noise).

Round 5 extends the sweep to 4 and 8 processes (VERDICT r4 item 6):
distributed_efficiency(n) = dist(n)/indep(n) stays meaningful under CPU
oversubscription because both configurations oversubscribe identically;
it isolates exactly the jax.distributed + global-mesh overhead that
would survive on real disjoint hosts.

Writes HOSTSCALING_r05.json at the repo root.
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
DEVICES_PER_PROC = 2
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


def run_config(n_workers: int, distributed: bool) -> float:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = ROOT / "scripts" / "_hostscale_worker.py"
    script.write_text(WORKER)
    nproc_arg = n_workers if distributed else 1
    procs = [subprocess.Popen(
        ["taskset", "-c", str(pid % max(1, os.cpu_count())),
         sys.executable, str(script), str(nproc_arg),
         str(pid if distributed else 0), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(n_workers)]
    vals = []
    for p in procs:
        out = p.communicate(timeout=2400)[0]
        assert p.returncode == 0, out[-2000:]
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT"):
                vals.append(float(line.split()[2]))
    assert len(vals) == n_workers
    return sum(vals) / len(vals)  # mean per-device poses/s


def main():
    t1 = run_config(1, distributed=False)
    print(f"1 process   x {DEVICES_PER_PROC} dev:        "
          f"{t1:.0f} poses/s/device", flush=True)
    rows = {"1_process": round(t1, 1)}
    eff = {}
    for n in (2, 4, 8):
        ti = run_config(n, distributed=False)
        print(f"{n} processes x {DEVICES_PER_PROC} dev (indep): "
              f"{ti:.0f} poses/s/device", flush=True)
        td = run_config(n, distributed=True)
        print(f"{n} processes x {DEVICES_PER_PROC} dev (dist):  "
              f"{td:.0f} poses/s/device", flush=True)
        rows[f"{n}_independent"] = round(ti, 1)
        rows[f"{n}_distributed"] = round(td, 1)
        eff[str(n)] = round(td / ti, 4)
        print(f"distributed_efficiency({n})={td / ti:.3f}", flush=True)
    artifact = {
        "config": {"devices_per_process": DEVICES_PER_PROC,
                   "swarms_per_device": 2, "glowworms": G, "steps": STEPS,
                   "backend": "cpu-virtual (n OS processes over 2 pinned "
                              "cores; 'dist' = one jax.distributed global "
                              "mesh; indep = same process count, no "
                              "coordination — the ratio isolates "
                              "multi-host overhead)"},
        "per_device_poses_per_s": rows,
        "distributed_efficiency": eff,
    }
    out = ROOT / "HOSTSCALING_r05.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
