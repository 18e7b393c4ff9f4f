#!/usr/bin/env python3
"""Probe 3: the supported dynamic_gather form, at v3-realistic shapes.

tpu.dynamic_gather wants idx.shape == operand.shape; with a 32-slot table
(30 DFIRE half-A slots + 2 zero pads) the pose axis is processed in
32-sublane groups: out[p, l] = tab_r[idx[p, l], l].

Kernel A (v3gather): fori over R receptor atoms; per r: direct-diff d2
(32, L), slot = trunc(2*sqrt(d2) - 1) clipped, one gather, accumulate.
Kernel B (v2chain): same loop with the 20-step where-chain (v2 math) for
an apples-to-apples ops comparison in this layout.
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

P, L, R, NSLOT = 32, 256, 1632, 32
THRESH = tuple(((np.arange(1, 21) + 1.0) ** 2 / 4.0).tolist())


def kernel(mode, lig_ref, rec_ref, tab_ref, out_ref):
    def body(r, acc):
        d2 = None
        for c in range(3):
            diff = lig_ref[:, c, :] - rec_ref[r, c]
            t = diff * diff
            d2 = t if d2 is None else d2 + t
        if mode == "v3gather":
            m = 2.0 * jnp.sqrt(d2) - 1.0
            idx = jnp.clip(m.astype(jnp.int32), 0, NSLOT - 1)
            g = jnp.take_along_axis(tab_ref[r], idx, axis=0,
                                    mode="promise_in_bounds")
            return acc + g
        contrib = jnp.broadcast_to(tab_ref[r, 0:1, :], d2.shape)
        for k, s in enumerate(THRESH):
            contrib = jnp.where(d2 >= s, contrib + tab_ref[r, k + 1:k + 2, :],
                                contrib)
        return acc + contrib * (d2 <= 225.0)

    out_ref[...] = jax.lax.fori_loop(0, R, body, jnp.zeros_like(out_ref))


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
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = np.asarray(f(lig, rec, tab))
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(lig, rec, tab))
            best = min(best, time.time() - t0)
        pairs = P * L * R
        print(f"{mode:9s} {best*1e3:8.3f} ms  {pairs/best:.4e} pairs/s  "
              f"(~{best*3.9e12/pairs:.1f} op-equiv/pair) chk={out.sum():.2f}",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{mode:9s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("v3gather")
    run("v2chain")
