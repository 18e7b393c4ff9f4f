#!/usr/bin/env python3
"""1k4c device benchmark: XLA vs Pallas DFIRE on the largest reference complex.

1k4c is the reference's heavyweight workload (rec 3413 x lig 3268 atoms =
11.15 M pairs/pose, membrane DFIRE, no ANM; baseline 1 m 52 s for 200
glowworms x 100 steps, /root/reference/README.md:48-50).  At this scale the
delta-potential tensor dominates HBM (21 x Nr x Nl: ~0.94 GB f32 / ~0.47 GB
bf16 after the cutoff trim), so the XLA elementwise path and the VMEM-
resident Pallas kernel trade differently than at 1ppe size.

One mode per process (the TPU tunnel can wedge on OOM-ish workloads; keep
runs separable and under `timeout`).  Prints one JSON line on stdout.

Usage:
  python scripts/bench_1k4c.py --mode xla   [--chunk N] [--steps 10]
  python scripts/bench_1k4c.py --mode pallas [--dq-bf16] [--r-tile 128] ...
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import signal
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))
BASELINE_POSES_PER_S = 200 * 100 / 112.132  # 178.4 poses/s (1k4c, README.md:48)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["xla", "pallas"], required=True)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=None,
                    help="XLA glowworm-axis energy chunk (default: auto)")
    ap.add_argument("--dq-bf16", action="store_true")
    ap.add_argument("--no-cull", action="store_true")
    ap.add_argument("--r-tile", type=int, default=None)
    ap.add_argument("--l-tile", type=int, default=None)
    ap.add_argument("--deadline", type=int,
                    default=int(os.environ.get("LIGHTDOCK_BENCH_TIMEOUT", "1200")))
    args = ap.parse_args()

    def _deadline(_sig, _frm):
        log("bench deadline exceeded (tunnel/compile stall); aborting")
        os._exit(2)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(args.deadline)

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as exc:  # noqa: BLE001
        log(f"compilation cache unavailable: {exc!r}")

    from lightdock_tpu.cli import pick_energy_chunk
    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.simulation import load_simulation

    log(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")

    ex = REFERENCE / "example/1k4c"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire")
    params = sim.batch_params(dtype=np.float32)
    g = sim.positions.shape[0]
    nr = params.rec_coords.shape[0]
    nl = params.lig_coords.shape[0]
    n_pairs = nr * nl
    log(f"workload: 1k4c {nr}x{nl} atoms ({n_pairs/1e6:.2f}M pairs), G={g}, "
        f"membrane beads={params.rec_num_membrane}")
    if params.dfire_dq is not None:
        log(f"dfire_dq: {params.dfire_dq.shape} "
            f"{params.dfire_dq.nbytes/1e9:.2f} GB host f32")

    kw = {"dq_bf16": args.dq_bf16}
    if args.mode == "xla":
        chunk = (args.chunk if args.chunk is not None
                 else pick_energy_chunk(n_pairs, g, 4))
        log(f"xla energy_chunk={chunk} dq_bf16={args.dq_bf16}")
        kw.update(energy_mode="xla", energy_chunk=chunk)
    else:
        kw.update(energy_mode="pallas", cull=not args.no_cull,
                  r_tile=args.r_tile, l_tile=args.l_tile)
        from lightdock_tpu.engine.energy_pallas import pick_tiles
        auto_r, auto_l = pick_tiles(params)
        log(f"tiles: {args.r_tile or auto_r}x{args.l_tile or auto_l} "
            f"cull={not args.no_cull} dq_bf16={args.dq_bf16}")

    runner = GsoJaxRunner(params, sim.positions, seed=sim.seed, use_anm=False,
                          anm_rec=0, anm_lig=0, dtype=jnp.float32, **kw)

    t0 = time.time()
    runner.reset()
    final, _ = runner.run(args.steps)
    np.asarray(final.scoring)
    log(f"compile+first run ({args.steps} steps): {time.time() - t0:.2f}s")

    times = []
    for _ in range(args.repeats):
        runner.reset()
        t0 = time.time()
        final, _ = runner.run(args.steps)
        np.asarray(final.scoring)
        times.append(time.time() - t0)
    best = min(times)
    poses_per_s = g * args.steps / best
    log(f"{args.steps}-step wall-clock: {best:.4f}s "
        f"(runs: {['%.3f' % t for t in times]})")
    log(f"pair-interactions/s: {g * args.steps * n_pairs / best:.3e}")
    print(json.dumps({
        "metric": f"poses_scored_per_sec_per_chip_1k4c_dfire_{args.mode}",
        "value": round(poses_per_s, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_s / BASELINE_POSES_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
