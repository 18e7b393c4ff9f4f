#!/usr/bin/env python3
"""Scale capability proof: synthetic 8192 x 8192-atom DFIRE complex
(67.1M pairs/pose — 6x the reference's biggest example) on ONE chip.

The v1 dq formulation needed (K, Nr, Nl) HBM = 5.6 GB at this size and
fell off the chip; the v2 type-indexed kernel carries O(Nr+Nl) tables
(~115 MB) + coordinates.  Runs a short GSO segment with the production
runner (energy_mode=pallas) and reports poses/s.

Usage: python scripts/bench_8k.py [--n 8192] [--g 200] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_complex(n_rec, n_lig, g, seed=7):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from lightdock_tpu.engine.energy_batch import build_batch_params
    from lightdock_tpu.scoring.models import DockingModel
    from lightdock_tpu.scoring.potentials import synthetic_potential

    rng = np.random.RandomState(seed)

    def model(n, radius):
        # Spherical blob (protein-like density ~0.008 atoms/A^3).
        pts = rng.standard_normal((n, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts *= radius * rng.uniform(0, 1, (n, 1)) ** (1 / 3)
        return DockingModel(
            method="dfire", coordinates=pts, num_anm=0,
            nmodes=np.zeros((0, n, 3)), membrane=np.zeros(0, dtype=np.int64),
            active_restraints={}, passive_restraints={},
            atom_types=rng.randint(0, 168, size=n).astype(np.int32))

    r = (n_rec / 0.008 * 3 / (4 * np.pi)) ** (1 / 3)
    params = build_batch_params(model(n_rec, r), model(n_lig, r),
                                use_anm=False, dtype=np.float32,
                                potential=synthetic_potential(),
                                dfire_mode="types")
    # Poses ring the receptor surface like lightdock swarms do.
    t = rng.standard_normal((g, 3))
    t = t / np.linalg.norm(t, axis=1, keepdims=True) * (2 * r + 5)
    q = rng.standard_normal((g, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pos = np.concatenate([t, q], axis=1)
    return params, pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--g", type=int, default=200)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", default="pallas")
    ap.add_argument("--r-tile", type=int, default=None)
    ap.add_argument("--l-tile", type=int, default=None)
    args = ap.parse_args()

    import signal

    def _deadline(_s, _f):
        log("deadline exceeded; aborting")
        os._exit(2)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(os.environ.get("LIGHTDOCK_BENCH_TIMEOUT", "2400")))

    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner

    log(f"backend={jax.default_backend()}")
    params, pos = synth_complex(args.n, args.n, args.g)
    n_pairs = args.n * args.n
    log(f"synthetic {args.n}x{args.n} = {n_pairs/1e6:.1f}M pairs, "
        f"G={args.g}; type tables: "
        f"{params.dfire_rec_half.nbytes/2**20:.0f} MiB f64 host "
        f"(f32 on device)")

    t0 = time.time()
    runner = GsoJaxRunner(params, pos, seed=324324, use_anm=False,
                          anm_rec=0, anm_lig=0, dtype=jnp.float32,
                          energy_mode=args.mode,
                          r_tile=args.r_tile, l_tile=args.l_tile)
    runner.run_segmented(args.steps, args.steps)
    np.asarray(runner.state.scoring)
    log(f"compile+first {args.steps} steps: {time.time() - t0:.2f}s")

    runner.reset()
    t0 = time.time()
    runner.run_segmented(args.steps, args.steps)
    sc = np.asarray(runner.state.scoring)
    dt = time.time() - t0
    assert np.isfinite(sc).all(), "non-finite scores"
    log(f"{args.steps}-step wall: {dt:.3f}s -> "
        f"{args.g * args.steps / dt:.1f} poses/s, "
        f"{args.g * args.steps * n_pairs / dt:.3e} pair-interactions/s")


if __name__ == "__main__":
    main()
