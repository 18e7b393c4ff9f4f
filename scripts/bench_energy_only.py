#!/usr/bin/env python3
"""Time ONE jitted energy call (no GSO machinery) for each energy mode.

Separates kernel cost from step overhead (movement phase, scan/dispatch).
Runs the call in a lax.fori_loop of --iters inner iterations to amortize
tunnel dispatch latency.

Usage: python scripts/bench_energy_only.py [--example 1ppe] [--iters 50]
       [--modes xla,pallas] [--r-tile R] [--l-tile L] [--no-cull]
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
    ap.add_argument("--example", default="1ppe")
    ap.add_argument("--method", default="dfire")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--modes", default="xla,pallas")
    ap.add_argument("--r-tile", type=int, default=None)
    ap.add_argument("--l-tile", type=int, default=None)
    ap.add_argument("--no-cull", action="store_true")
    ap.add_argument("--g", type=int, default=200)
    args = ap.parse_args()

    import signal

    def _deadline(_s, _f):
        log("deadline exceeded; aborting")
        os._exit(2)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(os.environ.get("LIGHTDOCK_BENCH_TIMEOUT", "2400")))

    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_batch import (batch_energy,
                                                   ensure_dfire_types)
    from lightdock_tpu.engine.energy_pallas import (make_pallas_energy_fn,
                                                    pick_tiles,
                                                    spatial_sort_params)
    from lightdock_tpu.engine.gso_jax import device_params
    from lightdock_tpu.simulation import load_simulation

    log(f"backend={jax.default_backend()}")
    ex = REFERENCE / f"example/{args.example}"
    use_anm = args.example in ("1azp", "2uuy", "1czy")
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          args.method, anm_dir=ex if use_anm else None)
    params = sim.batch_params(dtype=np.float32)
    g = args.g
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.uniform(-30, 30, (g, 3)), jnp.float32)
    q = rng.standard_normal((g, 4)); q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q, jnp.float32)
    ka_r = params.rec_nmodes.shape[0]
    ka_l = params.lig_nmodes.shape[0]
    ar = jnp.asarray(rng.uniform(-1, 1, (g, ka_r)), jnp.float32)
    al = jnp.asarray(rng.uniform(-1, 1, (g, ka_l)), jnp.float32)

    def timed(label, fn, p):
        it = args.iters

        @jax.jit
        def loop(p, t, q, ar, al):
            def body(i, acc):
                e = fn(p, t + 0.0 * acc[:3].sum(), q, ar, al)
                return acc + e[: acc.shape[0]]
            return jax.lax.fori_loop(0, it, body, jnp.zeros(8, jnp.float32))

        t0 = time.time()
        np.asarray(loop(p, t, q, ar, al))
        log(f"[{label}] compile+first: {time.time() - t0:.2f}s")
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(p, t, q, ar, al))
            best = min(best, time.time() - t0)
        per_call = best / it
        log(f"[{label}] {per_call*1e3:.3f} ms/call "
            f"({g / per_call:.0f} poses/s energy-only)")

    for mode in args.modes.split(","):
        if mode == "xla":
            dp = device_params(params, np.float32)
            timed("xla", lambda p, *a: batch_energy(p, *a, xp=jnp), dp)
        else:
            kernel = "v1" if mode == "pallas_v1" else "v2"
            p2 = ensure_dfire_types(params) if kernel == "v2" else params
            if kernel == "v2" and p2.method == "dfire":
                import dataclasses
                p2 = dataclasses.replace(p2, dfire_dq=None)
            auto_r, auto_l = pick_tiles(p2)
            r_tile = args.r_tile or auto_r
            l_tile = args.l_tile or auto_l
            p2 = spatial_sort_params(p2, r_tile=r_tile, l_tile=l_tile)
            fn = make_pallas_energy_fn(p2, cull=not args.no_cull,
                                       r_tile=r_tile, l_tile=l_tile,
                                       kernel=kernel)
            dp = device_params(p2, np.float32)
            timed(f"{mode} r{r_tile}xl{l_tile}", fn, dp)


if __name__ == "__main__":
    main()
