#!/usr/bin/env python3
"""Probe: does Mosaic lower a K-way table selection cheaply?

Three candidate inner loops for the DFIRE per-pair 21-entry cumulative
-table selection, benchmarked as standalone kernels on (P, R, L) tiles:

  chain  the current 20-step where-chain (baseline)
  tak    jnp.take_along_axis along a leading K axis of a VMEM scratch
  tourn  binary tournament of selects (log-structured, same exactness)

Also measures a bf16 variant of the chain to see if VPU bf16 packs 2x.
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

P, R, L = 8, 32, 256
K = 21
REPS = 400  # inner fori reps to amortize dispatch
THRESH = tuple(np.sort(np.random.RandomState(0).uniform(1, 225, K - 1)).tolist())


def mk_kernel(body):
    def kernel(d2_ref, tab_ref, out_ref):
        def rep(i, acc):
            d2 = d2_ref[...] + i.astype(d2_ref.dtype) * 1e-6
            return acc + body(d2, tab_ref)
        out_ref[...] = jax.lax.fori_loop(0, REPS, rep,
                                         jnp.zeros_like(out_ref))
    return kernel


def chain_body(d2, tab_ref):
    contrib = jnp.broadcast_to(tab_ref[0:1], d2.shape)
    for k, s in enumerate(THRESH):
        contrib = jnp.where(d2 >= s, contrib + tab_ref[k + 1:k + 2], contrib)
    return (contrib * (d2 <= 225.0)).sum(axis=(1, 2), keepdims=True)


def tak_body(d2, tab_ref):
    # slot index via arithmetic, then one dynamic gather along K
    idx = jnp.zeros(d2.shape, jnp.int32)
    for s in THRESH:
        idx = idx + (d2 >= s).astype(jnp.int32)
    tab = tab_ref[...]                                   # (K, R, L)
    g = jnp.take_along_axis(tab[None], idx[:, None, :, :], axis=1,
                            mode="promise_in_bounds")[:, 0]
    return (g * (d2 <= 225.0)).sum(axis=(1, 2), keepdims=True)


def tourn_body(d2, tab_ref):
    # cumulative-table tournament: leaves = tab rows, internal nodes select
    def sel(lo, hi, vals):
        if hi - lo == 1:
            return jnp.broadcast_to(tab_ref[lo:lo + 1], d2.shape)
        mid = (lo + hi) // 2
        left = sel(lo, mid, vals)
        right = sel(mid, hi, vals)
        return jnp.where(d2 >= THRESH[mid - 1], right, left)
    contrib = sel(0, K, None)
    return (contrib * (d2 <= 225.0)).sum(axis=(1, 2), keepdims=True)


def run(name, body, dtype=jnp.float32):
    d2 = jnp.asarray(np.random.RandomState(1).uniform(0, 400, (P, R, L)),
                     dtype)
    tab = jnp.asarray(np.random.RandomState(2).randn(K, R, L), dtype)
    try:
        f = pl.pallas_call(
            mk_kernel(body),
            out_shape=jax.ShapeDtypeStruct((P, 1, 1), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        f = jax.jit(f)
        out = np.asarray(f(d2, tab))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(d2, tab))
            best = min(best, time.time() - t0)
        pairs = P * R * L * REPS
        print(f"{name:8s} {best*1e3:8.3f} ms  {pairs/best:.3e} pair/s "
              f"({best/pairs*1e9*3.9e3:.1f} ops-equiv/pair) sum={out.sum():.3f}",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    a = run("chain", chain_body)
    b = run("tak", tak_body)
    c = run("tourn", tourn_body)
    if a is not None and b is not None:
        print("tak matches chain:", np.allclose(a, b, rtol=1e-6))
    if a is not None and c is not None:
        print("tourn matches chain:", np.allclose(a, c, rtol=1e-6))
    run("chain16", chain_body, jnp.bfloat16)
