#!/usr/bin/env python3
"""Probe 2: cost of the v3 inner loop pieces on real TPU.

Kernel A (gather): per r-iteration — d2 by direct diff, slot by
trunc(2*sqrt(d2)-1), one 2D sublane-axis gather from a (32, L) table.
Kernel B (chain): same d2, then the 20-step where-chain (v2's math).
Kernel C (slot only): d2 + slot, no gather (isolates gather cost).

Layout: poses on sublanes (P=128), ligand atoms on lanes (L=256),
receptor atoms looped 0..R (R=512 here). Tables vary per r (sliced from
a resident (R, 32, L) scratch) like the production v3 kernel would.
"""
from __future__ import annotations

import functools
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
signal.alarm(1500)

P, L, R = 128, 256, 512
NSLOT = 32
THRESH = tuple((np.arange(1, 21) + 1.0) ** 2 / 4.0)


def kernel(mode, lig_ref, rec_ref, tab_ref, out_ref):
    # lig: (P, 3, L) poses-on-sublanes; rec: (R, 3) in SMEM-ish VMEM;
    # tab: (R, NSLOT, L); out: (P, L) accumulated contributions.
    def body(r, acc):
        d2 = None
        for c in range(3):
            diff = lig_ref[:, c, :] - rec_ref[r, c]
            t = diff * diff
            d2 = t if d2 is None else d2 + t
        if mode == "gather" or mode == "slot":
            m = 2.0 * jnp.sqrt(d2) - 1.0
            idx = jnp.clip(m.astype(jnp.int32), 0, NSLOT - 1)
            if mode == "slot":
                return acc + idx.astype(jnp.float32)
            tab = tab_ref[r]                       # (NSLOT, L)
            g = jnp.take_along_axis(tab, idx, axis=0)
            return acc + g
        contrib = jnp.broadcast_to(tab_ref[r, 0:1, :], d2.shape)
        for k, s in enumerate(THRESH):
            contrib = jnp.where(d2 >= s, contrib + tab_ref[r, k + 1:k + 2, :],
                                contrib)
        return acc + contrib * (d2 <= 225.0)

    out_ref[...] = jax.lax.fori_loop(
        0, R, functools.partial(body), jnp.zeros_like(out_ref))


def run(mode):
    rng = np.random.RandomState(5)
    lig = jnp.asarray(rng.uniform(-20, 20, (P, 3, L)), jnp.float32)
    rec = jnp.asarray(rng.uniform(-20, 20, (R, 3)), jnp.float32)
    tab = jnp.asarray(rng.randn(R, NSLOT, L), jnp.float32)
    try:
        f = jax.jit(pl.pallas_call(
            functools.partial(kernel, mode),
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        out = np.asarray(f(lig, rec, tab))
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(lig, rec, tab))
            best = min(best, time.time() - t0)
        pairs = P * L * R
        print(f"{mode:8s} {best*1e3:8.3f} ms  {pairs/best:.4e} pairs/s  "
              f"(~{best*3.9e12/pairs:.1f} f32-op-equiv/pair) chk={out.sum():.2f}",
            flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return None


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("slot")
    a = run("gather")
    b = run("chain")
