#!/usr/bin/env python3
"""Multi-swarm farm A/B measurement (VERDICT r3 item 3: >=500k aggregate).

Measures the 1ppe DFIRE S-swarm farm (Pallas v2, pose-chunked) under each
kernel-optimization toggle, one subprocess per config (tunnel-fault
isolation).  Writes FARM_r04.json: {config: {S: {agg_poses_per_s, ...}}}.

Usage:
  python scripts/bench_farm_opts.py                    # all configs
  python scripts/bench_farm_opts.py --worker 8,32     # internal
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
STEPS = int(os.environ.get("FARM_BENCH_STEPS", "50"))

CONFIGS = {
    "prod": {},
    "subgate": {"LIGHTDOCK_V2_SUBGATE": "1"},
    "far_split": {"LIGHTDOCK_V2_FAR_SPLIT": "1"},
    "subgate_far": {"LIGHTDOCK_V2_SUBGATE": "1",
                    "LIGHTDOCK_V2_FAR_SPLIT": "1"},
    "pose_block16": {"LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "no_morton": {"LIGHTDOCK_POSE_ORDER": "none"},
    "no_exact_gate": {"LIGHTDOCK_V2_EXACT_GATE": "0"},
    "chain_select": {"LIGHTDOCK_V2_SELECT": "chain"},
    "far_chain": {"LIGHTDOCK_V2_FAR_SPLIT": "1",
                  "LIGHTDOCK_V2_SELECT": "chain"},
    "subgate_far_chain": {"LIGHTDOCK_V2_SUBGATE": "1",
                          "LIGHTDOCK_V2_FAR_SPLIT": "1",
                          "LIGHTDOCK_V2_SELECT": "chain"},
    # round 2: bits-driven far/near split (no in-kernel reduces at all)
    "far_bits": {"LIGHTDOCK_V2_FAR_BITS": "1"},
    "far_bits_chain": {"LIGHTDOCK_V2_FAR_BITS": "1",
                       "LIGHTDOCK_V2_SELECT": "chain"},
    "far_bits_pb16": {"LIGHTDOCK_V2_FAR_BITS": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "far_bits_chain_pb16": {"LIGHTDOCK_V2_FAR_BITS": "1",
                            "LIGHTDOCK_V2_SELECT": "chain",
                            "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "far_chain_pb16": {"LIGHTDOCK_V2_FAR_SPLIT": "1",
                       "LIGHTDOCK_V2_SELECT": "chain",
                       "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "noeg_pb16": {"LIGHTDOCK_V2_EXACT_GATE": "0",
                  "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "far_bits_pb32": {"LIGHTDOCK_V2_FAR_BITS": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "32"},
    # round 3: ligand-axis culling (2 ligand tiles at 1ppe instead of 1)
    "far_bits_l128": {"LIGHTDOCK_V2_FAR_BITS": "1",
                      "LIGHTDOCK_FARM_LTILE": "128"},
    "far_bits_pb16_l128": {"LIGHTDOCK_V2_FAR_BITS": "1",
                           "LIGHTDOCK_V2_POSE_BLOCK": "16",
                           "LIGHTDOCK_FARM_LTILE": "128"},
    "far_bits_pb16_aug": {"LIGHTDOCK_V2_FAR_BITS": "1",
                          "LIGHTDOCK_V2_POSE_BLOCK": "16",
                          "LIGHTDOCK_V2_D2": "aug"},
    "far_bits_pb32_aug": {"LIGHTDOCK_V2_FAR_BITS": "1",
                          "LIGHTDOCK_V2_POSE_BLOCK": "32",
                          "LIGHTDOCK_V2_D2": "aug"},
    "far_bits_pb64": {"LIGHTDOCK_V2_FAR_BITS": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "64"},
    "far_bits_pb32_l128": {"LIGHTDOCK_V2_FAR_BITS": "1",
                           "LIGHTDOCK_V2_POSE_BLOCK": "32",
                           "LIGHTDOCK_FARM_LTILE": "128"},
    # round 4: sub-block bits — act/near bits at 8-receptor-row granularity
    # (4x finer skipping from SMEM, no in-kernel reduce)
    "sub_bits_pb32": {"LIGHTDOCK_V2_SUB_BITS": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "32"},
    "sub_bits_pb16": {"LIGHTDOCK_V2_SUB_BITS": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "sub_bits_pb8": {"LIGHTDOCK_V2_SUB_BITS": "1",
                     "LIGHTDOCK_V2_POSE_BLOCK": "8"},
    "sub_bits_pb32_l128": {"LIGHTDOCK_V2_SUB_BITS": "1",
                           "LIGHTDOCK_V2_POSE_BLOCK": "32",
                           "LIGHTDOCK_FARM_LTILE": "128"},
    # round 4: three-way far split (fourth cutoff ~11.5 A, quarter-depth
    # subtree for provably-very-far chunks) and receptor tile 64
    "far2_pb32": {"LIGHTDOCK_V2_FAR2": "1",
                  "LIGHTDOCK_V2_POSE_BLOCK": "32"},
    "far_bits_pb32_r64": {"LIGHTDOCK_V2_POSE_BLOCK": "32",
                          "LIGHTDOCK_FARM_RTILE": "64"},
    "far2_pb32_r64": {"LIGHTDOCK_V2_FAR2": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "32",
                      "LIGHTDOCK_FARM_RTILE": "64"},
    # round 5 (VERDICT r4 item 9): work-list grid at farm scale
    "worklist_pb32": {"LIGHTDOCK_V2_WORKLIST": "1",
                      "LIGHTDOCK_V2_POSE_BLOCK": "32"},
}
# Swarm counts per config: the S sweep only for prod (compiles are ~5-8
# min each through the tunnel); toggles are A/B'd at the target S=32.
SWEEP = {"prod": (8, 32, 64)}
DEFAULT_S = (32,)

# Round 5 (VERDICT r4 item 2): the 1azp DNA farm — elec/vdw v2 kernel
# with the new vdw-tier far bits (V2_EV_FAR_BITS) and the pose-block A/B
# the DFIRE kernel already had.  S=1 uses GsoJaxRunner (comparable with
# the 116.9k poses/s round-3 number in gso_jax.py); target >=135k.
DNA_CONFIGS = {
    # defaults resolve to r_tile=64 (receptor ANM) + pose block 8 (the
    # VMEM guard: r64 + pb16 measured 17.2M > 16M scoped limit)
    "ev_prod": {},
    "ev_no_far_bits": {"LIGHTDOCK_V2_EV_FAR_BITS": "0"},
    # the r32 family trades the halved receptor-block refetch count for
    # wider pose chunks (the DFIRE kernel's measured-best direction)
    "ev_r32_pb8": {"LIGHTDOCK_FARM_RTILE": "32",
                   "LIGHTDOCK_V2_POSE_BLOCK": "8"},
    "ev_r32_pb16": {"LIGHTDOCK_FARM_RTILE": "32",
                    "LIGHTDOCK_V2_POSE_BLOCK": "16"},
    "ev_r32_pb32": {"LIGHTDOCK_FARM_RTILE": "32",
                    "LIGHTDOCK_V2_POSE_BLOCK": "32"},
    "ev_exact_gate_nobits": {"LIGHTDOCK_V2_EV_FAR_BITS": "0",
                             "LIGHTDOCK_V2_EV_EXACT_GATE": "1"},
}
DNA_SWEEP = {"ev_prod": (1, 8, 32), "ev_no_far_bits": (1, 32),
             "ev_r32_pb16": (1, 32), "ev_r32_pb32": (1, 32)}
DNA_DEFAULT_S = (1,)


def worker(s_list) -> int:
    import signal

    signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
    signal.alarm(int(os.environ.get("FARM_BENCH_TIMEOUT", "2700")))

    import numpy as np

    sys.path.insert(0, str(ROOT))
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.parallel.farm import SwarmFarmRunner
    from lightdock_tpu.simulation import load_simulation

    example = os.environ.get("FARM_BENCH_EXAMPLE", "1ppe")
    method = os.environ.get("FARM_BENCH_METHOD", "dfire")
    ex = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE",
                                     "/root/reference")) / "example" / example
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          method, anm_dir=ex)
    g = sim.positions.shape[0]
    params = sim.batch_params(dtype=np.float32)
    l_tile = os.environ.get("LIGHTDOCK_FARM_LTILE")
    r_tile = os.environ.get("LIGHTDOCK_FARM_RTILE")
    out = {}
    for s in s_list:
        if s == 1:
            from lightdock_tpu.engine.gso_jax import GsoJaxRunner
            runner = GsoJaxRunner(params, sim.positions, sim.seed,
                                  sim.use_anm, sim.setup.anm_rec,
                                  sim.setup.anm_lig, dtype=jnp.float32,
                                  energy_mode="pallas",
                                  l_tile=int(l_tile) if l_tile else None,
                                  r_tile=int(r_tile) if r_tile else None)

            def reset(r=runner):
                r.reset()

            def fetch(r=runner):
                np.asarray(r.state.scoring)
        else:
            runner = SwarmFarmRunner(params, [sim.positions] * s,
                                     list(range(s)), seed=324324,
                                     use_anm=sim.use_anm,
                                     anm_rec=sim.setup.anm_rec,
                                     anm_lig=sim.setup.anm_lig,
                                     dtype=jnp.float32,
                                     output_root=None, energy_mode="pallas",
                                     l_tile=int(l_tile) if l_tile else None,
                                     r_tile=int(r_tile) if r_tile else None)
            states0 = runner.states

            def reset(r=runner):
                r.reset()

            def fetch(r=runner):
                np.asarray(r.states.scoring)

        t0 = time.time()
        runner.run_segmented(STEPS, segment=STEPS)
        fetch()
        compile_t = time.time() - t0
        best = 1e9
        for _ in range(3):
            reset()
            t0 = time.time()
            runner.run_segmented(STEPS, segment=STEPS)
            fetch()
            best = min(best, time.time() - t0)
        out[str(s)] = {
            "agg_poses_per_s": round(s * g * STEPS / best, 1),
            "ms_per_step": round(best / STEPS * 1e3, 3),
            "compile_s": round(compile_t, 1),
        }
        del runner
    print(json.dumps({"backend": jax.default_backend(), "results": out}))
    return 0


def main() -> int:
    only = None
    dna = "--dna" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    out_name = os.environ.get("FARM_BENCH_OUT",
                              "FARM_r05.json" if dna else "FARM_r04.json")
    configs, sweep, default_s = ((DNA_CONFIGS, DNA_SWEEP, DNA_DEFAULT_S)
                                 if dna else (CONFIGS, SWEEP, DEFAULT_S))
    prior = {}
    if (ROOT / out_name).exists():
        prior = json.loads((ROOT / out_name).read_text()).get("configs", {})
    results = dict(prior)
    for name, env_over in configs.items():
        if only is not None and name not in only:
            continue
        s_list = sweep.get(name, default_s)
        env = dict(os.environ, **env_over)
        if dna:
            env.setdefault("FARM_BENCH_EXAMPLE", "1azp")
            env.setdefault("FARM_BENCH_METHOD", "dna")
        print(f"=== {name} {env_over} S={s_list}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--worker",
                 ",".join(map(str, s_list))], env=env,
                capture_output=True, text=True, timeout=3000)
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
        results[name] = json.loads(line)["results"]
        print(f"{name}: {results[name]}", flush=True)

    out_path = ROOT / out_name
    workload = ("1azp dna farm (elec/vdw v2 + vdw-tier far bits), "
                f"{STEPS} steps, S=1 via GsoJaxRunner" if dna
                else f"1ppe dfire farm, {STEPS} steps, pallas v2")
    out_path.write_text(json.dumps(
        {"workload": workload, "configs": results}, indent=2) + "\n")
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        s_arg = sys.argv[sys.argv.index("--worker") + 1]
        sys.exit(worker([int(x) for x in s_arg.split(",")]))
    sys.exit(main())
