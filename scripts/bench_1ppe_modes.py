#!/usr/bin/env python3
"""Compare energy modes (xla / pallas v2 / pallas v1) on the 1ppe
north-star workload (1615 x 221 atoms, 200 glowworms, 100 GSO steps) on
the current backend.  Diagnostics to stderr; one summary line per mode.

Usage: python scripts/bench_1ppe_modes.py [--modes xla,pallas] [--steps N]
       [--r-tile R] [--l-tile L] [--runs K] [--example 1ppe|1azp|...]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

import numpy as np

REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="xla,pallas")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--r-tile", type=int, default=None)
    ap.add_argument("--l-tile", type=int, default=None)
    ap.add_argument("--example", default="1ppe")
    ap.add_argument("--method", default="dfire")
    ap.add_argument("--no-cull", action="store_true")
    args = ap.parse_args()

    import signal

    def _deadline(_s, _f):
        log("deadline exceeded (tunnel/compile stall); aborting")
        os._exit(2)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(os.environ.get("LIGHTDOCK_BENCH_TIMEOUT", "2400")))

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as exc:  # noqa: BLE001
        log(f"compile cache unavailable: {exc!r}")

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.simulation import load_simulation

    log(f"backend={jax.default_backend()} ndev={len(jax.devices())}")
    ex = REFERENCE / f"example/{args.example}"
    use_anm = args.example in ("1azp", "2uuy", "1czy")
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          args.method, anm_dir=ex if use_anm else None)
    params = sim.batch_params(dtype=np.float32)
    g = sim.positions.shape[0]
    n_pairs = params.rec_coords.shape[0] * params.lig_coords.shape[0]
    log(f"{args.example} {args.method}: {params.rec_coords.shape[0]}x"
        f"{params.lig_coords.shape[0]} = {n_pairs/1e3:.0f}k pairs, G={g}, "
        f"anm={sim.use_anm}")

    for mode in args.modes.split(","):
        t0 = time.time()
        runner = GsoJaxRunner(params, sim.positions, seed=sim.seed,
                              use_anm=sim.use_anm, anm_rec=sim.setup.anm_rec,
                              anm_lig=sim.setup.anm_lig, dtype=jnp.float32,
                              energy_mode=mode, cull=not args.no_cull,
                              r_tile=args.r_tile, l_tile=args.l_tile)
        runner.run_segmented(args.steps, 10)
        np.asarray(runner.state.scoring)
        log(f"[{mode}] compile+first: {time.time() - t0:.2f}s")
        times = []
        for _ in range(args.runs):
            runner.reset()
            t0 = time.time()
            runner.run_segmented(args.steps, 10)
            np.asarray(runner.state.scoring)
            times.append(time.time() - t0)
        best = min(times)
        log(f"[{mode}] {args.steps}-step wall: {best:.4f}s "
            f"({g * args.steps / best:.0f} poses/s) runs="
            f"{['%.3f' % t for t in times]}")


if __name__ == "__main__":
    main()
