#!/usr/bin/env python3
"""Probe 5: which dynamic_gather forms compile (and how fast)?"""
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
signal.alarm(2400)

P, L, NSLOT = 32, 256, 32
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(0.1, 200, (P, L)), jnp.float32)
idx32 = jnp.asarray(rng.randint(0, 32, (P, L)), jnp.int32)
tab2 = jnp.asarray(rng.randn(NSLOT, L), jnp.float32)
tab3 = jnp.asarray(rng.randn(64, NSLOT, L), jnp.float32)


def probe(name, kernel, *operands, timed=False, work=1):
    try:
        f = jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = np.asarray(f(*operands))
        msg = f"{name:28s} OK   sum={out.sum():.2f}"
        if timed:
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                np.asarray(f(*operands))
                best = min(best, time.time() - t0)
            msg += f"  {best*1e6:.0f} us ({best*3.9e12/(P*L*work):.2f} ops-eq/elem)"
        print(msg, flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return False


def k_bare(i_ref, t_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0,
                                     mode="promise_in_bounds")


probe("bare_gather", k_bare, idx32, tab2)


def k_comp(a_ref, t_ref, o_ref):
    idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...]) - 1.0).astype(jnp.int32),
                   0, NSLOT - 1)
    o_ref[...] = jnp.take_along_axis(t_ref[...], idx, axis=0,
                                     mode="promise_in_bounds")


probe("computed_idx_gather", k_comp, x, tab2)


def k_fori_static_tab(a_ref, t_ref, o_ref):
    tab = t_ref[...]
    def body(r, acc):
        idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...] + r.astype(jnp.float32))
                        - 1.0).astype(jnp.int32), 0, NSLOT - 1)
        return acc + jnp.take_along_axis(tab, idx, axis=0,
                                         mode="promise_in_bounds")
    o_ref[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(o_ref))


probe("fori_static_tab_gather", k_fori_static_tab, x, tab2, timed=True,
      work=64)


def k_fori_dynload(a_ref, t_ref, o_ref):
    def body(r, acc):
        tab = pl.load(t_ref, (pl.ds(r, 1), slice(None), slice(None)))[0]
        idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...] + r.astype(jnp.float32))
                        - 1.0).astype(jnp.int32), 0, NSLOT - 1)
        return acc + jnp.take_along_axis(tab, idx, axis=0,
                                         mode="promise_in_bounds")
    o_ref[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(o_ref))


probe("fori_plload_gather", k_fori_dynload, x, tab3, timed=True, work=64)


def k_unrolled(a_ref, t_ref, o_ref):
    acc = jnp.zeros((P, L), jnp.float32)
    for r in range(64):
        idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...] + float(r)) - 1.0)
                       .astype(jnp.int32), 0, NSLOT - 1)
        acc = acc + jnp.take_along_axis(t_ref[r], idx, axis=0,
                                        mode="promise_in_bounds")
    o_ref[...] = acc


probe("unrolled_static_slices", k_unrolled, x, tab3, timed=True, work=64)
print("done", flush=True)
