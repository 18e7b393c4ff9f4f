#!/usr/bin/env python3
"""Experiment 2: multi-swarm per-chip throughput with params uploaded ONCE.

Round-1 bench showed 4 swarms at 15.7k poses/s aggregate vs 81k single —
experiment 1 showed plain vmap scales perfectly, implicating the repeated
device_put of params inside run_multi_swarm's timed region.  Here params
are uploaded once (like production) and we measure vmap vs flat-energy
at production step counts.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightdock_tpu.engine.gso_jax import device_params, gso_step, run_swarm
from lightdock_tpu.parallel.multihost import stack_swarm_states, swarm_randoms
from lightdock_tpu.simulation import load_simulation

STEPS = 50


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    ex = "/root/reference/example/1ppe"
    sim = load_simulation(f"{ex}/setup.json", f"{ex}/initial_positions_0.dat",
                          "dfire")
    params = device_params(sim.batch_params(dtype=np.float32), np.float32)
    params = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.device_put(x), params)
    positions = sim.positions
    g = positions.shape[0]

    for S in (1, 4, 8):
        states = stack_swarm_states([positions] * S, False, 0, 0, jnp.float32)
        randoms = jnp.asarray(swarm_randoms(324324, STEPS, S, g), jnp.float32)

        def run_one(state, rnd):
            return run_swarm(params, state, rnd)
        f_vmap = jax.jit(lambda s, r: jax.vmap(run_one, in_axes=(0, 1))(s, r))
        dt = timed(f_vmap, states, randoms)
        print(f"S={S} vmap: {dt:.4f}s = {S*g*STEPS/dt:.0f} poses/s aggregate",
              flush=True)

        from lightdock_tpu.engine.energy_batch import batch_energy

        def flat_energy(p, t, q, ar, al):
            s_, g_ = t.shape[0], t.shape[1]
            sc = batch_energy(p, t.reshape(s_ * g_, 3), q.reshape(s_ * g_, 4),
                              ar.reshape(s_ * g_, -1), al.reshape(s_ * g_, -1),
                              xp=jnp)
            return sc.reshape(s_, g_)

        def step_c(st, rnd):
            scores = flat_energy(params, st.t, st.q, st.a_rec, st.a_lig)

            def move_one(state, r, sc):
                return gso_step(params, state, r, energy_fn=lambda *_: sc)
            return jax.vmap(move_one)(st, rnd, scores)

        f_flat = jax.jit(lambda st, rnds: jax.lax.scan(step_c, st, rnds))
        dt = timed(f_flat, states, randoms)
        print(f"S={S} flat: {dt:.4f}s = {S*g*STEPS/dt:.0f} poses/s aggregate",
              flush=True)


if __name__ == "__main__":
    main()
