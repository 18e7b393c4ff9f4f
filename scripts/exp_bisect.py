#!/usr/bin/env python3
"""Probe 4: bisect the remote-compile failures."""
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
signal.alarm(1500)

P, L, NSLOT = 32, 256, 32


def probe(name, kernel, *operands, smem=()):
    try:
        specs = [pl.BlockSpec(memory_space=(pltpu.SMEM if i in smem
                                            else pltpu.VMEM))
                 for i in range(len(operands))]
        f = jax.jit(pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((P, L), jnp.float32),
            in_specs=specs, out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
        out = np.asarray(f(*operands))
        print(f"{name:32s} OK   sum={out.sum():.2f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name:32s} FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return False


rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(0.1, 200, (P, L)), jnp.float32)
idx32 = jnp.asarray(rng.randint(0, 32, (P, L)), jnp.int32)
tab2 = jnp.asarray(rng.randn(NSLOT, L), jnp.float32)


# 1. bare gather, precomputed idx, idx.shape == operand.shape
def k_bare_gather(i_ref, t_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0,
                                     mode="promise_in_bounds")


probe("bare_gather_32", k_bare_gather, idx32, tab2)


# 2. gather fed by computed idx
def k_comp_gather(a_ref, t_ref, o_ref):
    idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...]) - 1.0).astype(jnp.int32),
                   0, NSLOT - 1)
    o_ref[...] = jnp.take_along_axis(t_ref[...], idx, axis=0,
                                     mode="promise_in_bounds")


probe("computed_idx_gather", k_comp_gather, x, tab2)

# 3. fori + dynamic 3D slice (small table)
tab3_small = jnp.asarray(rng.randn(64, NSLOT, L), jnp.float32)


def k_fori_slice(a_ref, t_ref, o_ref):
    def body(r, acc):
        return acc + t_ref[r, 0:1, :] * (a_ref[...] * 0 + 1)
    o_ref[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(o_ref))


probe("fori_dyn3dslice_64", k_fori_slice, x, tab3_small)


# 4. fori + gather from dynamically sliced table
def k_fori_gather(a_ref, t_ref, o_ref):
    def body(r, acc):
        idx = jnp.clip((2.0 * jnp.sqrt(a_ref[...]) - 1.0).astype(jnp.int32)
                       + r % 2, 0, NSLOT - 1)
        return acc + jnp.take_along_axis(t_ref[r], idx, axis=0,
                                         mode="promise_in_bounds")
    o_ref[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(o_ref))


probe("fori_gather_64", k_fori_gather, x, tab3_small)

# 5. big VMEM operand (53 MB) no loop
tab_big = jnp.asarray(np.zeros((1632, NSLOT, L), np.float32))


def k_big(a_ref, t_ref, o_ref):
    o_ref[...] = a_ref[...] + t_ref[7, 0:1, :]


probe("vmem_53mb_touch", k_big, x, tab_big)

# 6. 20-step where chain inside fori (small)
THRESH = tuple(((np.arange(1, 21) + 1.0) ** 2 / 4.0).tolist())


def k_chain_fori(a_ref, t_ref, o_ref):
    def body(r, acc):
        d2 = a_ref[...]
        contrib = jnp.broadcast_to(t_ref[r, 0:1, :], d2.shape)
        for k, s in enumerate(THRESH):
            contrib = jnp.where(d2 >= s, contrib + t_ref[r, k + 1:k + 2, :],
                                contrib)
        return acc + contrib
    o_ref[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(o_ref))


probe("chain_fori_64", k_chain_fori, x, tab3_small)
print("done", flush=True)
