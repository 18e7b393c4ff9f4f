#!/usr/bin/env python3
"""Measure Pallas vs XLA on small complexes + the chunked S=32 farm.

VERDICT r2 item 4: PALLAS_AUTO_MIN_PAIRS=100k sent 1czy (1281 x 53 = 67.9k
pairs, ANM 10+10) to XLA on an unmeasured assumption — measure it.  Also
re-measures the 32-swarm 1ppe farm with pose-chunked kernel calls.

Usage: python scripts/bench_small_complexes.py [1czy] [farm32] [1ppe]
"""
from __future__ import annotations

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STEPS = 100


def log(*a):
    print(*a, flush=True)


def timed_runner(runner, steps, g, n_swarms=1):
    import jax
    runner.reset()
    t0 = time.time()
    runner.run_segmented(steps, 10)
    np.asarray(jax.tree_util.tree_leaves(runner.state
                                         if hasattr(runner, "state")
                                         else runner.states)[0])
    compile_t = time.time() - t0
    best = 1e9
    for _ in range(3):
        runner.reset()
        t0 = time.time()
        runner.run_segmented(steps, 10)
        np.asarray(jax.tree_util.tree_leaves(
            runner.state if hasattr(runner, "state") else runner.states)[0])
        best = min(best, time.time() - t0)
    return best, compile_t


def bench_single(example, method, anm, modes=("xla", "pallas")):
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.simulation import load_simulation

    ex = f"/root/reference/example/{example}"
    pos = (f"{ex}/init/initial_positions_0.dat"
           if os.path.exists(f"{ex}/init") else f"{ex}/initial_positions_0.dat")
    sim = load_simulation(f"{ex}/setup.json", pos, method, anm_dir=ex)
    g = sim.positions.shape[0]
    n_pairs = sim.receptor.num_atoms * sim.ligand.num_atoms
    log(f"[{example}] {sim.receptor.num_atoms}x{sim.ligand.num_atoms} "
        f"= {n_pairs} pairs, anm={sim.use_anm}")
    for mode in modes:
        runner = GsoJaxRunner(sim.batch_params(dtype=np.float32),
                              sim.positions, sim.seed, sim.use_anm,
                              sim.setup.anm_rec, sim.setup.anm_lig,
                              dtype=jnp.float32, energy_mode=mode)
        best, ct = timed_runner(runner, STEPS, g)
        log(f"[{example}] {mode:7s} {best:.4f}s for {STEPS} steps = "
            f"{g*STEPS/best:,.0f} poses/s (compile {ct:.0f}s)")


def bench_crossover(n_rec_list=(700, 1100)):
    """Pin the XLA/Pallas crossover (VERDICT r4 item 8): truncated-1ppe
    receptors at ~155k and ~243k pairs bracket PALLAS_AUTO_MIN_PAIRS=100k
    from inside the round-4 gap (endpoints measured: 68k pairs XLA wins
    2.7x, 357k Pallas wins).  Real protein geometry (leading receptor
    atoms), ligand untouched."""
    import dataclasses

    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.simulation import load_simulation

    ex = "/root/reference/example/1ppe"
    sim = load_simulation(f"{ex}/setup.json", f"{ex}/initial_positions_0.dat",
                          "dfire")
    g = sim.positions.shape[0]
    out = {}
    for n_rec in n_rec_list:
        rec = dataclasses.replace(
            sim.receptor,
            coordinates=sim.receptor.coordinates[:n_rec],
            nmodes=sim.receptor.nmodes[:, :n_rec]
                if sim.receptor.nmodes.size else sim.receptor.nmodes,
            atom_types=sim.receptor.atom_types[:n_rec],
            membrane=sim.receptor.membrane[
                sim.receptor.membrane < n_rec],
            active_restraints={
                k: [i for i in v if i < n_rec]
                for k, v in sim.receptor.active_restraints.items()},
        )
        from lightdock_tpu.engine.energy_batch import build_batch_params
        from lightdock_tpu.scoring.potentials import synthetic_potential
        params = build_batch_params(rec, sim.ligand, use_anm=False,
                                    dtype=np.float32,
                                    potential=synthetic_potential())
        n_pairs = n_rec * sim.ligand.num_atoms
        row = {}
        for mode in ("xla", "pallas"):
            runner = GsoJaxRunner(params, sim.positions, sim.seed, False,
                                  0, 0, dtype=jnp.float32, energy_mode=mode)
            best, ct = timed_runner(runner, STEPS, g)
            row[mode] = round(g * STEPS / best, 1)
            log(f"[x{n_pairs//1000}k] {mode:7s} {g*STEPS/best:,.0f} poses/s "
                f"(compile {ct:.0f}s)")
        out[str(n_pairs)] = row
    import json
    path = "/root/repo/SMALL_r05.json"
    prior = {}
    if os.path.exists(path):
        prior = json.loads(open(path).read())
    prior["crossover_truncated_1ppe"] = out
    with open(path, "w") as fh:
        json.dump(prior, fh, indent=2)
    log(f"wrote {path}")


def bench_farm32():
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.parallel.farm import SwarmFarmRunner
    from lightdock_tpu.simulation import load_simulation

    ex = "/root/reference/example/1ppe"
    sim = load_simulation(f"{ex}/setup.json", f"{ex}/initial_positions_0.dat",
                          "dfire")
    g = sim.positions.shape[0]
    for s in (32,):
        runner = SwarmFarmRunner(sim.batch_params(dtype=np.float32),
                                 [sim.positions] * s, list(range(s)),
                                 seed=324324, use_anm=False, anm_rec=0,
                                 anm_lig=0, dtype=jnp.float32,
                                 output_root=None, energy_mode="pallas")
        best, ct = timed_runner(runner, 50, g, s)
        log(f"[farm] S={s}: {best:.4f}s for 50 steps = "
            f"{s*g*50/best:,.0f} poses/s aggregate (compile {ct:.0f}s)")


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
    signal.alarm(int(os.environ.get("EXP_TIMEOUT", "3000")))
    which = sys.argv[1:] or ["1czy", "farm32"]
    import jax
    log("backend:", jax.default_backend())
    if "1czy" in which:
        bench_single("1czy", "dfire", True)
    if "2uuy" in which:
        bench_single("2uuy", "dfire", True)
    if "1ppe" in which:
        bench_single("1ppe", "dfire", False)
    if "farm32" in which:
        bench_farm32()
    if "crossover" in which:
        bench_crossover()
    log("done")
