#!/usr/bin/env python3
"""Round-3 experiment: decompose the v2 farm energy step at S=8 (1ppe).

Phases timed in isolation (each scanned STEPS times, best-of-2):
  efull    complete production energy_fn (sort + xform + cull + kernel)
  kernel   dfire_pairs_pallas_v2 alone (fixed transformed coords + bits)
  cull     cull_mask_boxes + coarsen + chunk-OR + pack
  xform    rotation_matrix + ligand einsum
  sort     morton key + lexsort + gathers + inverse scatter

Also reports cull/exact-gate selectivity stats for the pose set, and
repeats kernel/cull for --l-tile=128 to judge finer lane gating.

Usage: python scripts/exp_v2_breakdown.py [S] [--l-tile=256]
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
    signal.alarm(int(os.environ.get("EXP_TIMEOUT", "3000")))

    import dataclasses as dc
    import functools

    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_batch import ensure_dfire_types
    from lightdock_tpu.engine.energy_pallas import (_morton_key,
                                                    make_pallas_energy_fn,
                                                    pick_tiles, resolve_kernel,
                                                    spatial_sort_params)
    from lightdock_tpu.engine.gso_jax import device_params
    from lightdock_tpu.ops import quaternion as qt
    from lightdock_tpu.ops.pallas_energy import (L_SUB, R_SUB,
                                                 dfire_pose_block,
                                                 cull_mask_boxes,
                                                 dfire_pairs_pallas_v2,
                                                 tile_boxes)
    from lightdock_tpu.parallel.farm import SwarmFarmRunner
    from lightdock_tpu.simulation import load_simulation

    S = 8
    l_tile_arg = None
    for a in sys.argv[1:]:
        if a.startswith("--l-tile="):
            l_tile_arg = int(a.split("=")[1])
        elif a.isdigit():
            S = int(a)

    ex = "/root/reference/example/1ppe"
    sim = load_simulation(f"{ex}/setup.json", f"{ex}/initial_positions_0.dat",
                          "dfire")
    params_host = sim.batch_params(dtype=np.float32)
    positions = sim.positions
    g1 = positions.shape[0]
    n = S * g1

    p2 = ensure_dfire_types(params_host)
    p2 = dc.replace(p2, dfire_dq=None)
    rt, lt = pick_tiles(p2, resolve_kernel(p2, "auto"))
    if l_tile_arg:
        lt = l_tile_arg
    p2 = spatial_sort_params(p2, r_tile=rt, l_tile=lt)
    dp = device_params(p2, dtype=jnp.float32)
    nr = p2.rec_coords.shape[0]
    nl = p2.lig_coords.shape[0]
    log(f"backend={jax.default_backend()} 1ppe nr={nr} nl={nl} "
        f"S={S} n={n} tiles r={rt} l={lt}")

    # Pose set: replicate swarm positions S times (same as the farm bench).
    pos = np.tile(positions, (S, 1))
    t = jnp.asarray(pos[:, :3], jnp.float32)
    q = jnp.asarray(pos[:, 3:7], jnp.float32)
    a_rec = jnp.zeros((n, 0), jnp.float32)
    a_lig = jnp.zeros((n, 0), jnp.float32)

    # ---- geometry constants exactly as make_pallas_energy_fn builds them
    r_sub = R_SUB if rt % R_SUB == 0 else rt
    l_sub = L_SUB if lt % L_SUB == 0 else lt
    rec_centers, rec_half_box = tile_boxes(p2.rec_coords, r_sub)
    lig_centers, lig_half_box = tile_boxes(p2.lig_coords, l_sub)
    n_r = -(-nr // rt)
    n_l = -(-nl // lt)
    rg, lg_ = rt // r_sub, lt // l_sub

    def pad_groups(centers, half, n_tiles, group):
        need = n_tiles * group
        pad = need - centers.shape[0]
        if pad > 0:
            centers = np.pad(centers, ((0, pad), (0, 0)))
            half = np.pad(half, ((0, pad), (0, 0)), constant_values=-np.inf)
        return centers, half

    rec_centers, rec_half_box = pad_groups(rec_centers, rec_half_box, n_r, rg)
    lig_centers, lig_half_box = pad_groups(lig_centers, lig_half_box, n_l, lg_)
    rc = jnp.asarray(rec_centers, jnp.float32)
    rh = jnp.asarray(rec_half_box, jnp.float32)
    lc = jnp.asarray(lig_centers, jnp.float32)
    lh = jnp.asarray(lig_half_box, jnp.float32)
    center = jnp.asarray(np.asarray(p2.rec_coords, np.float64).mean(0),
                         jnp.float32)
    cutoff = 15.0
    iface_cutoff = (3.9 + 1.0) / 2.0
    thresholds = tuple(float(x) for x in np.asarray(p2.dfire_thresholds,
                                                    np.float64))
    zeros = jnp.zeros(n, jnp.float32)

    def cull_fn(tt, rot):
        fine = cull_mask_boxes(rc, rh, lc, lh, tt, rot, zeros, zeros,
                               (cutoff, iface_cutoff))

        def coarsen(a):
            return a.reshape(n_r, rg, n_l, lg_, n).max(axis=(1, 3))

        act, act_iface = (coarsen(a) for a in fine)
        p_blk = dfire_pose_block(n)
        gp = -(-n // p_blk) * p_blk
        act_c = jnp.pad(act, ((0, 0), (0, 0), (0, gp - n)))
        act_c = act_c.reshape(n_r, n_l, gp // p_blk, p_blk).max(axis=-1)
        return act, act_c, act_iface

    def xform_fn(tt, qq):
        rot = qt.rotation_matrix(qq, jnp)
        lig = jnp.einsum("gab,nb->gan", rot, dp.lig_coords)
        lig = lig + (tt - center[None])[:, :, None]
        return rot, lig

    rot0, lig0 = jax.jit(xform_fn)(t, q)
    _, act_c0, act_iface0 = jax.jit(cull_fn)(t, rot0)
    rec_all0 = (dp.rec_coords - center[None])[None]

    # ---- selectivity stats
    act_np = np.asarray(act_c0)
    log(f"chunk-tile cull active fraction: {act_np.mean():.3f} "
        f"(grid {act_np.shape})")
    # exact in-cut stats at sub-block granularities (pose, lane-half);
    # computed in pose chunks to avoid a (P, nr, nl, 3) f32 intermediate
    # (several GB at 1ppe scale).
    rec_np = np.asarray(rec_all0)[0]                      # (nr, 3)
    lig_np = np.asarray(lig0).transpose(0, 2, 1)          # (n, nl, 3)
    n_stat = (min(200, lig_np.shape[0]) // 8) * 8
    if n_stat == 0:
        log("selectivity stats skipped: fewer than 8 poses")
    else:
        nrp, nlp = -(-nr // rt) * rt, -(-nl // lt) * lt
        incp = np.zeros((n_stat, nrp, nlp), bool)
        rec2 = (rec_np ** 2).sum(-1)                      # (nr,)
        for p0 in range(0, n_stat, 16):
            lc = lig_np[p0:p0 + 16]
            lig2 = (lc ** 2).sum(-1)                      # (P, nl)
            dot = np.einsum("ra,pla->prl", rec_np, lc)
            d2c = rec2[None, :, None] + lig2[:, None, :] - 2.0 * dot
            incp[p0:p0 + 16, :nr, :nl] = d2c <= cutoff ** 2
        b = incp.reshape(n_stat, n_r, rt, n_l, lt)
        log(f"exact tile-active/pose: {float(b.any(axis=(2, 4)).mean()):.3f}")
        b8 = incp.reshape(n_stat // 8, 8, n_r, rt, n_l, lt)
        log(f"exact tile-active/8-pose-chunk: "
            f"{float(b8.any(axis=(1, 3, 5)).mean()):.3f}")
        if (n_l * lt) % 128 == 0:
            h = incp.reshape(n_stat, n_r, rt, n_l * lt // 128, 128)
            h8 = incp.reshape(n_stat // 8, 8, n_r, rt, n_l * lt // 128, 128)
            log(f"exact 128-lane-half active/pose: "
                f"{float(h.any(axis=(2, 4)).mean()):.3f}"
                f"  /8-chunk: {float(h8.any(axis=(1, 3, 5)).mean()):.3f}")
            if rt % 8 == 0:
                rr = incp.reshape(n_stat, n_r, rt // 8, 8,
                                  n_l * lt // 128, 128)
                rr8 = incp.reshape(n_stat // 8, 8, n_r, rt // 8, 8,
                                   n_l * lt // 128, 128)
                log(f"exact (8r,128l) active/pose: "
                    f"{float(rr.any(axis=(3, 5)).mean()):.3f}"
                    f"  /8-chunk: {float(rr8.any(axis=(1, 4, 6)).mean()):.3f}")
        else:
            log("sub-block stats skipped: ligand width not 128-divisible")
        log(f"pair in-cutoff fraction (first {n_stat} poses): "
            f"{float(incp[:, :nr, :nl].mean()):.4f}")

    def timed(name, f, *a, reps=2):
        t0 = time.time()
        f = jax.jit(f)
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        warm = time.time() - t0
        best = 1e9
        for _ in range(reps):
            t1 = time.time()
            out = f(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.time() - t1)
        per_step = best / STEPS
        log(f"{name:10s} {best:.4f}s = {per_step*1e3:.3f} ms/step "
            f"= {n*STEPS/best:,.0f} poses/s (compile {warm:.0f}s)")

    # kernel-only: fixed bits, perturb lig a hair per iteration
    def kernel_body(c, _):
        raw, _, _ = dfire_pairs_pallas_v2(
            rec_all0, lig0 + c * 1e-7, dp.dfire_rec_half, dp.dfire_lig_onehot,
            thresholds, act_c0, act_iface0, r_tile=rt, l_tile=lt,
            need_iface=False)
        return raw.sum() * 0.0, None

    timed("kernel", lambda: jax.lax.scan(kernel_body, jnp.float32(0), None,
                                         length=STEPS))

    def kernel_if_body(c, _):
        raw, ifr, ifl = dfire_pairs_pallas_v2(
            rec_all0, lig0 + c * 1e-7, dp.dfire_rec_half, dp.dfire_lig_onehot,
            thresholds, act_c0, act_iface0, r_tile=rt, l_tile=lt,
            need_iface=True)
        return raw.sum() * 0.0 + ifr.sum() * 0.0 + ifl.sum() * 0.0, None

    timed("kernel_if", lambda: jax.lax.scan(kernel_if_body, jnp.float32(0),
                                            None, length=STEPS))

    def cull_body(c, _):
        _, act_c, _ = cull_fn(t + c * 1e-7, rot0)
        return act_c.sum().astype(jnp.float32) * 0.0, None

    timed("cull", lambda: jax.lax.scan(cull_body, jnp.float32(0), None,
                                       length=STEPS))

    def xform_body(c, _):
        _, lig = xform_fn(t + c * 1e-7, q)
        return lig.sum() * 0.0, None

    timed("xform", lambda: jax.lax.scan(xform_body, jnp.float32(0), None,
                                        length=STEPS))

    moved = jnp.ones((n,), bool)

    def sort_body(c, _):
        tt = t + c * 1e-7
        morton = _morton_key(tt)
        order = jnp.lexsort((morton,
                             jnp.logical_not(moved).astype(jnp.int32)))
        inv = jnp.argsort(order)
        s = (tt[order] + q[order].sum(1, keepdims=True)).sum(1)
        return s[inv].sum() * 0.0, None

    timed("sort", lambda: jax.lax.scan(sort_body, jnp.float32(0), None,
                                       length=STEPS))

    # full production energy_fn (as the farm builds it, incl. pose chunking)
    from lightdock_tpu.engine.energy_pallas import pose_chunked_energy
    efn = pose_chunked_energy(
        make_pallas_energy_fn(p2, cull=True, r_tile=rt, l_tile=lt))
    sc0 = jnp.zeros((n,), jnp.float32)

    def efull_body(c, _):
        s = efn(dp, t + c * 1e-7, q, a_rec, a_lig, moved=moved,
                prev_scoring=sc0)
        return s.sum() * 0.0, None

    timed("efull", lambda: jax.lax.scan(efull_body, jnp.float32(0), None,
                                        length=STEPS))
    log("done")


if __name__ == "__main__":
    main()
