#!/usr/bin/env python3
"""Per-optimization kernel measurement (VERDICT r3 item 2).

Measures the 1ppe DFIRE 100-step bench (200 glowworms, Pallas v2 path)
under each kernel-optimization toggle, one fresh subprocess per config so
a tunnel fault or compile stall in one config cannot poison the rest:

  prod          all production optimizations (the headline config)
  no_morton     LIGHTDOCK_POSE_ORDER=none      (Morton pose sort off)
  no_exact_gate LIGHTDOCK_V2_EXACT_GATE=0      (min-d2 chunk gates off)
  chain_select  LIGHTDOCK_V2_SELECT=chain      (serial select chain)
  far_split     LIGHTDOCK_V2_FAR_SPLIT=1       (far/near tournament split)

Writes KERNEL_r04.json at the repo root: {config: {poses_per_s, wall_s,
delta_vs_prod_pct}}.  Each toggle is proven semantically free by
tests/test_pallas.py::test_pallas_v2_measurement_toggles and
::test_pallas_v2_far_split_parity.

Usage:
  python scripts/bench_kernel_opts.py            # run all configs
  python scripts/bench_kernel_opts.py --worker   # internal (one config)
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
STEPS = int(os.environ.get("KERNEL_BENCH_STEPS", "100"))

CONFIGS = {
    "prod": {},
    "no_morton": {"LIGHTDOCK_POSE_ORDER": "none"},
    "no_exact_gate": {"LIGHTDOCK_V2_EXACT_GATE": "0"},
    "chain_select": {"LIGHTDOCK_V2_SELECT": "chain"},
    "far_split": {"LIGHTDOCK_V2_FAR_SPLIT": "1"},
    # round 5 (VERDICT r4 item 9): 1-D grid over the compacted active
    # -tile list — dead tiles never scheduled (vs per-chunk bit skips)
    "worklist": {"LIGHTDOCK_V2_WORKLIST": "1"},
}


def worker() -> int:
    import signal

    signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
    signal.alarm(int(os.environ.get("KERNEL_BENCH_TIMEOUT", "1500")))

    import numpy as np

    sys.path.insert(0, str(ROOT))
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.simulation import load_simulation

    ex = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE",
                                     "/root/reference")) / "example/1ppe"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire")
    g = sim.positions.shape[0]
    runner = GsoJaxRunner(sim.batch_params(dtype=np.float32), sim.positions,
                          sim.seed, False, 0, 0, dtype=jnp.float32,
                          energy_mode="pallas")
    t0 = time.time()
    runner.reset()
    final, _ = runner.run_segmented(STEPS, 10)
    np.asarray(final.scoring)
    compile_t = time.time() - t0
    best = 1e9
    for _ in range(3):
        runner.reset()
        t0 = time.time()
        final, _ = runner.run_segmented(STEPS, 10)
        np.asarray(final.scoring)
        best = min(best, time.time() - t0)
    print(json.dumps({"poses_per_s": round(g * STEPS / best, 1),
                      "wall_s": round(best, 4),
                      "compile_s": round(compile_t, 1),
                      "backend": jax.default_backend()}))
    return 0


def main() -> int:
    results = {}
    for name, env_over in CONFIGS.items():
        env = dict(os.environ, **env_over)
        print(f"=== {name} {env_over}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--worker"], env=env,
                capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)
            results[name] = {"error": "timeout"}
            continue
        line = next((ln for ln in reversed(out.stdout.splitlines())
                     if ln.startswith("{")), None)
        if out.returncode != 0 or line is None:
            print(f"{name}: FAILED rc={out.returncode}\n{out.stderr[-2000:]}",
                  flush=True)
            results[name] = {"error": f"rc={out.returncode}"}
            continue
        results[name] = json.loads(line)
        print(f"{name}: {results[name]}", flush=True)

    prod = results.get("prod", {}).get("poses_per_s")
    if prod:
        for name, r in results.items():
            if "poses_per_s" in r:
                r["delta_vs_prod_pct"] = round(
                    100.0 * (r["poses_per_s"] - prod) / prod, 2)
    out_path = ROOT / os.environ.get("KERNEL_BENCH_OUT",
                                     "KERNEL_r04.json")
    out_path.write_text(json.dumps(
        {"workload": "1ppe dfire, 200 glowworms, 100 steps, pallas v2",
         "configs": results}, indent=2) + "\n")
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(worker() if "--worker" in sys.argv else main())
