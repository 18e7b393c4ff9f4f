#!/usr/bin/env python3
"""North-star benchmark: poses scored/sec/chip, 1ppe DFIRE, 200 glowworms.

Runs the batched device engine for 100 GSO steps on the 1ppe complex
(1615 x 221 atoms, no ANM) — the reference's headline configuration
(BASELINE.md: 4.252 s wall-clock, ~4.7k poses/s upper bound on one M3 CPU
core) — and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Diagnostics go to stderr.  The DFIRE table contents do not affect timing;
the synthetic table stands in when data/DCparams is absent.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

BASELINE_POSES_PER_S = 4700.0  # reference upper bound, BASELINE.md (1ppe)
REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))
STEPS = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_1ppe():
    from lightdock_tpu.simulation import load_simulation

    ex = REFERENCE / "example/1ppe"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat", "dfire")
    return sim.batch_params(dtype=np.float32), sim.positions


def synth_1ppe_shaped():
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from __graft_entry__ import _toy_system

    params, pos, _ = _toy_system(n_rec=1615, n_lig=221, g=200)
    return params, pos


def main() -> int:
    import signal

    def _deadline(_sig, _frm):
        log("bench deadline exceeded (tunnel/compile stall); aborting")
        os._exit(2)

    # Guard against a hung device tunnel: the remote-compile path has been
    # observed to stall indefinitely.
    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(os.environ.get("LIGHTDOCK_BENCH_TIMEOUT", "3000")))

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat bench runs skip compilation
        cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as exc:  # noqa: BLE001
        log(f"compilation cache unavailable: {exc!r}")
    # AOT executable cache (utils.aotcache): jax's persistent cache does
    # not engage with the axon tunnel plugin; this one serializes whole
    # compiled executables, so a REPEAT bench process skips the remote
    # compile entirely (BENCH_r04 paid 1,768 s).  Falls back silently if
    # the plugin refuses serialization.
    os.environ.setdefault(
        "LIGHTDOCK_AOT_CACHE",
        str(pathlib.Path(__file__).parent / ".aot_cache"))

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"backend={backend} device={dev.device_kind} ndev={len(jax.devices())}")

    if (REFERENCE / "example/1ppe/setup.json").exists():
        params, positions = load_1ppe()
        log("workload: real 1ppe (1615x221 atoms)")
    else:
        params, positions = synth_1ppe_shaped()
        log("workload: synthetic 1ppe-shaped system")

    g = positions.shape[0]
    n_pairs = params.rec_coords.shape[0] * params.lig_coords.shape[0]

    runner = GsoJaxRunner(params, positions, seed=324324, use_anm=False,
                          anm_rec=0, anm_lig=0, dtype=jnp.float32,
                          energy_chunk=0,
                          energy_mode=os.environ.get("LIGHTDOCK_BENCH_MODE",
                                                     "auto"))

    # Warm-up/compile.  One scan over all steps: a single device dispatch,
    # so tunnel round-trip latency is paid once (np.asarray forces the
    # device->host fetch: block_until_ready can return early on tunneled
    # platforms).
    t0 = time.time()
    runner.reset()
    final, _ = runner.run_segmented(STEPS, 10)
    np.asarray(final.scoring)
    log(f"compile+first run: {time.time() - t0:.2f}s")

    # Timed runs (min-of-5: the tunnel adds multi-10% jitter on occasion —
    # KERNEL_r05 measured 0.124 s for a program bench.py saw at 0.156 s
    # minutes earlier).
    times = []
    for _ in range(5):
        runner.reset()
        t0 = time.time()
        final, _ = runner.run_segmented(STEPS, 10)
        np.asarray(final.scoring)
        times.append(time.time() - t0)
    best = min(times)
    poses_per_s = g * STEPS / best
    log(f"100-step wall-clock: {best:.4f}s (runs: {['%.3f' % t for t in times]})")
    log(f"pair-interactions/s: {g * STEPS * n_pairs / best:.3e}")

    # Supplementary: multi-swarm aggregate throughput (the production
    # batching/scaling story; stderr only — the north-star metric above is
    # the driver-recorded line).
    if os.environ.get("LIGHTDOCK_BENCH_MULTISWARM", "1") != "0":
        try:
            aggregate_multiswarm(params, positions, g)
        except Exception as exc:  # noqa: BLE001
            log(f"multi-swarm aggregate skipped: {exc!r}")

    print(json.dumps({
        "metric": "poses_scored_per_sec_per_chip_1ppe_dfire",
        "value": round(poses_per_s, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_s / BASELINE_POSES_PER_S, 2),
    }))
    return 0


def aggregate_multiswarm(params, positions, g, n_swarms: int = 32,
                         steps: int = 50):
    """Throughput with several swarms batched per chip (and, on multi-
    device systems, sharded over the swarm mesh axis): the scaling-
    efficiency figure (SURVEY §7 step 6).  Uses the production farm
    (flat-batched energy, params uploaded once at construction)."""
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.parallel.farm import SwarmFarmRunner

    n_dev = len(jax.devices())
    s = max(n_swarms, n_dev)
    runner = SwarmFarmRunner(params, [positions] * s, list(range(s)),
                             seed=324324, use_anm=False, anm_rec=0, anm_lig=0,
                             dtype=jnp.float32, output_root=None,
                             energy_mode=os.environ.get(
                                 "LIGHTDOCK_BENCH_MODE", "auto"))
    runner.run_segmented(steps, segment=steps)  # compile + warm-up
    np.asarray(runner.states.scoring)
    runner.reset()
    t0 = time.time()
    runner.run_segmented(steps, segment=steps)
    np.asarray(runner.states.scoring)
    dt = time.time() - t0
    agg = s * g * steps / dt
    log(f"multi-swarm aggregate: {s} swarms x {steps} steps on {n_dev} "
        f"device(s): {agg:.0f} poses/s total ({agg / s:.0f} per swarm)")


if __name__ == "__main__":
    sys.exit(main())
