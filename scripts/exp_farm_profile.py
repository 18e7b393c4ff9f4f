#!/usr/bin/env python3
"""Round-3 experiment: where does the multi-swarm farm step's time go?

VERDICT r2: 8x1ppe aggregate = 158k poses/s vs 128k single-swarm — per-pose
cost is ~constant in G, so the bottleneck scales with poses (kernel inner
loop / cull / transform), not a fixed per-step cost.  This script times the
farm step's phases in isolation on the real chip:

  full        production farm step (energy + movement)
  energy      pose transform + cull + pallas kernel only (fixed poses)
  energy_ng   energy without the moved-first argsort gate
  energy_nc   energy with cull disabled
  move        movement/neighbor phases only (energy = passthrough)
  cull        cull_mask_boxes + coarsen only
  xform       pose transform only

Usage: python scripts/exp_farm_profile.py [S ...] [--variants a,b,c]
"""
from __future__ import annotations

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STEPS = 50


def log(*a):
    print(*a, flush=True)


def main():
    signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
    signal.alarm(int(os.environ.get("EXP_TIMEOUT", "2700")))

    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import (GsoJaxRunner, SwarmState,
                                              device_params, gso_step)
    from lightdock_tpu.parallel.farm import SwarmFarmRunner, make_farm_step
    from lightdock_tpu.parallel.multihost import (stack_swarm_states,
                                                  swarm_randoms)
    from lightdock_tpu.simulation import load_simulation

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    swarm_counts = [int(a) for a in args] or [8]
    variants = None
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = set(a.split("=", 1)[1].split(","))

    ex = "/root/reference/example/1ppe"
    sim = load_simulation(f"{ex}/setup.json", f"{ex}/initial_positions_0.dat",
                          "dfire")
    params_host = sim.batch_params(dtype=np.float32)
    positions = sim.positions
    g = positions.shape[0]
    log(f"backend={jax.default_backend()} complex=1ppe "
        f"nr={params_host.rec_coords.shape[0]} nl={params_host.lig_coords.shape[0]}")

    def timed(fn, *a, reps=2):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.time() - t0)
        return best

    for S in swarm_counts:
        n = S * g
        log(f"--- S={S} (G_flat={n}) ---")
        # Build the production pallas energy_fn exactly as the farm does.
        runner = SwarmFarmRunner(params_host, [positions] * S,
                                 list(range(S)), seed=324324, use_anm=False,
                                 anm_rec=0, anm_lig=0, dtype=jnp.float32,
                                 output_root=None, energy_mode="pallas")
        params = runner.params
        states = runner.states
        randoms = jax.device_put(
            jnp.asarray(swarm_randoms(324324, STEPS, S, g), jnp.float32),
            runner._randoms_sharding)

        # Reach into the runner's compiled farm step pieces: rebuild the
        # energy fn with knobs.
        import dataclasses as dc

        from lightdock_tpu.engine.energy_batch import ensure_dfire_types
        from lightdock_tpu.engine.energy_pallas import (make_pallas_energy_fn,
                                                        pick_tiles,
                                                        resolve_kernel,
                                                        spatial_sort_params)
        from lightdock_tpu.engine.energy_pallas import pose_chunked_energy
        p2 = ensure_dfire_types(params_host)
        p2 = dc.replace(p2, dfire_dq=None)
        rt, lt = pick_tiles(p2, resolve_kernel(p2, "auto"))
        p2 = spatial_sort_params(p2, r_tile=rt, l_tile=lt)
        efn = pose_chunked_energy(
            make_pallas_energy_fn(p2, cull=True, r_tile=rt, l_tile=lt))
        efn_nc = pose_chunked_energy(
            make_pallas_energy_fn(p2, cull=False, r_tile=rt, l_tile=lt))
        dp2 = device_params(p2, dtype=jnp.float32)
        log(f"tiles: r={rt} l={lt}")

        flat = lambda st: (st.t.reshape(n, 3), st.q.reshape(n, 4),
                           st.a_rec.reshape(n, -1), st.a_lig.reshape(n, -1))

        def run(name, make_body, *extra):
            if variants and name not in variants:
                return
            t0 = time.time()
            f = jax.jit(make_body)
            dt = timed(f, *extra)
            per_step = dt / STEPS
            log(f"{name:12s} {dt:.4f}s = {per_step*1e3:.3f} ms/step"
                f" = {n*STEPS/dt:,.0f} poses/s (compile+warm {time.time()-t0-2*dt:.0f}s)")

        # full production step
        step = make_farm_step(efn)
        run("full", lambda p, s, r: jax.lax.scan(
            lambda st, rr: step(p, st, rr), s, r), dp2, states, randoms)

        # energy-only: fixed poses, scan STEPS times (carry = dummy scalar)
        t_, q_, ar_, al_ = flat(states)
        mv = jnp.ones((n,), bool)
        sc0 = jnp.zeros((n,), jnp.float32)

        def e_body(efn_, gate):
            def body(c, _):
                kw = dict(moved=mv, prev_scoring=sc0) if gate else {}
                s = efn_(dp2, t_ + c * 1e-6, q_, ar_, al_, **kw)
                return s.sum() * 0.0, None
            return lambda: jax.lax.scan(body, jnp.float32(0),
                                        None, length=STEPS)

        run("energy", e_body(efn, True))
        run("energy_ng", e_body(efn, False))
        run("energy_nc", e_body(efn_nc, False))

        # cull-only: tile-box mask + coarsen at the kernel's geometry
        # (rebuilt here at the same shapes make_pallas_energy_fn uses).
        from lightdock_tpu.ops.pallas_energy import (R_SUB, L_SUB,
                                                     cull_mask_boxes,
                                                     tile_boxes)
        r_sub = R_SUB if rt % R_SUB == 0 else rt
        l_sub = L_SUB if lt % L_SUB == 0 else lt
        rcen, rhal = tile_boxes(p2.rec_coords, r_sub)
        lcen, lhal = tile_boxes(p2.lig_coords, l_sub)
        n_rt = -(-p2.rec_coords.shape[0] // rt)
        n_lt = -(-p2.lig_coords.shape[0] // lt)
        rg_, lg_ = rt // r_sub, lt // l_sub

        def padg(c, h, n_tiles, grp):
            pad = n_tiles * grp - c.shape[0]
            if pad > 0:
                c = np.pad(c, ((0, pad), (0, 0)))
                h = np.pad(h, ((0, pad), (0, 0)), constant_values=-np.inf)
            return jnp.asarray(c, jnp.float32), jnp.asarray(h, jnp.float32)
        rcen, rhal = padg(rcen, rhal, n_rt, rg_)
        lcen, lhal = padg(lcen, lhal, n_lt, lg_)
        zs = jnp.zeros((n,), jnp.float32)

        def cull_body():
            def body(c, _):
                rot = qt.rotation_matrix(q_, jnp)
                fine = cull_mask_boxes(rcen, rhal, lcen, lhal, t_ + c * 1e-6,
                                       rot, zs, zs, (15.0, 2.45))
                acts = [a.reshape(n_rt, rg_, n_lt, lg_, n).max(axis=(1, 3))
                        for a in fine]
                return c + sum(a.sum() for a in acts).astype(jnp.float32) * 0.0, None
            return jax.lax.scan(body, jnp.float32(0), None, length=STEPS)

        # sort-only: Morton key + lexsort + pose gather (the permutation
        # overhead energy_fn pays before every kernel call)
        from lightdock_tpu.engine.energy_pallas import _morton_key

        def sort_body():
            def body(c, _):
                tt = t_ + c * 1e-6
                key = _morton_key(tt)
                order = jnp.lexsort((key, (zs > 0).astype(jnp.int32)))
                inv = jnp.argsort(order)
                s = (tt[order].sum() + q_[order].sum()
                     + inv.astype(jnp.float32).sum())
                return c + s * 0.0, None
            return jax.lax.scan(body, jnp.float32(0), None, length=STEPS)

        from lightdock_tpu.ops import quaternion as qt
        run("cull", cull_body)
        run("sort", sort_body)

        # movement-only: energy = passthrough of carried scoring
        def move_step(p, st, rr):
            def move(s1, r1):
                return gso_step(p, s1, r1,
                                energy_fn=lambda *a, **k: s1.scoring + 1e-7)
            return jax.vmap(move)(st, rr)

        run("move", lambda p, s, r: jax.lax.scan(
            lambda st, rr: move_step(p, st, rr), s, r), dp2, states, randoms)

        # cull-only + transform-only: reuse internals via private handles
        from lightdock_tpu.ops import quaternion as qt
        from lightdock_tpu.ops.pallas_energy import cull_mask_boxes

        def xform_body():
            def body(c, _):
                rot = qt.rotation_matrix(q_, jnp)
                lig = jnp.einsum("gab,nb->gan", rot, dp2.lig_coords)
                lig = lig + (t_ + c * 1e-6)[:, :, None]
                return c + lig.sum() * 0.0, None
            return jax.lax.scan(body, jnp.float32(0), None, length=STEPS)

        run("xform", xform_body)
        del runner
    log("done")


if __name__ == "__main__":
    main()
