#!/usr/bin/env python3
"""Micro-probes: which v3 constructs does the TPU toolchain accept?"""
from __future__ import annotations

import functools
import os
import signal
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

signal.signal(signal.SIGALRM, lambda *_: os._exit(3))
signal.alarm(1200)

P, L = 16, 256


def probe(name, kernel, *operands, smem=()):  # smem: indices into operands
    try:
        specs = [pl.BlockSpec(memory_space=(pltpu.SMEM if i in smem
                                            else pltpu.VMEM))
                 for i in range(len(operands))]
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = np.asarray(f(*operands))
        print(f"{name:28s} OK   sum={out.sum():.3f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(0.1, 200, (P, L)), jnp.float32)
tab = jnp.asarray(rng.randn(32, L), jnp.float32)
tab3 = jnp.asarray(rng.randn(8, 32, L), jnp.float32)
rec = jnp.asarray(rng.uniform(-5, 5, (8, 3)), jnp.float32)

probe("sqrt", lambda a, o: o.__setitem__(..., jnp.sqrt(a[...])), x)
probe("trunc_cast",
      lambda a, o: o.__setitem__(
          ..., jnp.clip((2.0 * jnp.sqrt(a[...]) - 1.0).astype(jnp.int32),
                        0, 31).astype(jnp.float32)), x)
probe("gather_static_tab",
      lambda a, t, o: o.__setitem__(
          ..., jnp.take_along_axis(
              t[...], jnp.clip((2.0 * jnp.sqrt(a[...]) - 1.0)
                               .astype(jnp.int32), 0, 31), axis=0)), x, tab)
probe("gather_dyn_tab",
      lambda a, t, o: o.__setitem__(
          ..., jnp.take_along_axis(
              t[2], jnp.clip((2.0 * jnp.sqrt(a[...]) - 1.0)
                             .astype(jnp.int32), 0, 31), axis=0)), x, tab3)


def k_smem_scalar(a_ref, r_ref, o_ref):
    def body(r, acc):
        return acc + (a_ref[...] - r_ref[r, 0])
    o_ref[...] = jax.lax.fori_loop(0, 8, body, jnp.zeros_like(o_ref))


probe("smem_scalar_loop", k_smem_scalar, x, rec, smem=(1,))


def k_fori_gather(a_ref, t_ref, o_ref):
    def body(r, acc):
        idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...] + r.astype(jnp.float32))
                        - 1.0).astype(jnp.int32), 0, 31)
        return acc + jnp.take_along_axis(t_ref[r], idx, axis=0)
    o_ref[...] = jax.lax.fori_loop(0, 8, body, jnp.zeros_like(o_ref))


probe("fori_dyn_gather", k_fori_gather, x, tab3)


def k_where_chain(a_ref, t_ref, o_ref):
    d2 = a_ref[...]
    contrib = jnp.broadcast_to(t_ref[0:1, :], d2.shape)
    for k in range(20):
        s = (k + 2.0) ** 2 / 4.0
        contrib = jnp.where(d2 >= s, contrib + t_ref[k + 1:k + 2, :], contrib)
    o_ref[...] = contrib


probe("where_chain20", k_where_chain, x, tab)
print("done", flush=True)
