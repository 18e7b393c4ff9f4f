"""Compiled-mode kernel checks on real TPU hardware (tpu marker).

Interpret mode (tests/test_pallas.py) validates kernel semantics but not
what Mosaic actually compiles — the round-1 bf16-matmul d2 bug class only
shows up compiled.  These tests run the v2 kernels compiled on the chip
and compare against (a) the same kernel in interpret mode on the same
device arrays (tight: identical math, different executor) and (b) the
fused XLA path (loose: f32 accumulation-order noise).

Run: LIGHTDOCK_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py -q
(the driver's bench wrapper runs this when the chip is reachable).
"""

import os
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE", "/root/reference"))


def _require_tpu():
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend ({jax.default_backend()})")


def _toy(method, n_rec=300, n_lig=170, num_anm=0, seed=3, g=32):
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_batch import (build_batch_params,
                                                   ensure_dfire_types)
    from lightdock_tpu.scoring.models import DockingModel
    from lightdock_tpu.scoring.potentials import synthetic_potential

    rng = np.random.RandomState(seed)

    def model(n):
        kw = {}
        if method == "dfire":
            kw["atom_types"] = rng.randint(0, 168, size=n).astype(np.int32)
        else:
            kw.update(ele_charges=rng.uniform(-1, 1, n),
                      vdw_charges=rng.uniform(0, 0.5, n),
                      vdw_radii=rng.uniform(0.5, 2.5, n))
        return DockingModel(
            method=method, coordinates=rng.uniform(-40, 40, size=(n, 3)),
            num_anm=num_anm,
            nmodes=(rng.standard_normal((num_anm, n, 3)) * 0.2 if num_anm
                    else np.zeros((0, n, 3))),
            membrane=np.zeros(0, dtype=np.int64),
            active_restraints={"A.1": [1, 2]}, passive_restraints={}, **kw)

    params = build_batch_params(
        model(n_rec), model(n_lig), use_anm=num_anm > 0, dtype=np.float32,
        potential=synthetic_potential() if method == "dfire" else None,
        dfire_mode="gather")
    params = ensure_dfire_types(params)
    t = rng.uniform(-30, 30, (g, 3)).astype(np.float32)
    q = rng.standard_normal((g, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    a_r = rng.uniform(-1, 1, (g, num_anm)).astype(np.float32)
    a_l = rng.uniform(-1, 1, (g, num_anm)).astype(np.float32)
    return params, (jnp.asarray(t), jnp.asarray(q),
                    jnp.asarray(a_r), jnp.asarray(a_l))


@pytest.mark.parametrize("method,num_anm", [("dfire", 0), ("dfire", 2),
                                            ("dna", 0)])
def test_compiled_kernel_matches_interpret_toy(method, num_anm):
    """Compiled Mosaic output == interpreter output on the same device
    arrays (tight tolerance: same arithmetic, different executor)."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_pallas import make_pallas_energy_fn
    from lightdock_tpu.engine.gso_jax import device_params

    params, pose = _toy(method, num_anm=num_anm)
    dp = device_params(params, np.float32)
    compiled = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    interp = make_pallas_energy_fn(params, kernel="v2",
                                   interpret=True)(dp, *pose)
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("method", ["dfire", "dna"])
def test_compiled_kernel_matches_xla_toy(method):
    """Compiled v2 vs the fused XLA path, both on the chip (loose: f32
    accumulation order differs; XLA transform matmuls run HIGHEST-free)."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_batch import batch_energy
    from lightdock_tpu.engine.energy_pallas import make_pallas_energy_fn
    from lightdock_tpu.engine.gso_jax import device_params

    params, pose = _toy(method)
    dp = device_params(params, np.float32)
    pal = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    xla = jax.jit(lambda p, *a: batch_energy(p, *a, xp=jnp))(dp, *pose)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)


def test_compiled_dfire_1ppe_shapes():
    """Flagship shape (1615 x 221, G=200): compiled v2 vs interpret on the
    chip, single energy call (fast compile; the full-run perf story lives
    in bench.py)."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_pallas import make_pallas_energy_fn
    from lightdock_tpu.engine.gso_jax import device_params

    if (REFERENCE / "example/1ppe/setup.json").exists():
        from lightdock_tpu.simulation import load_simulation
        ex = REFERENCE / "example/1ppe"
        sim = load_simulation(ex / "setup.json",
                              ex / "initial_positions_0.dat", "dfire")
        params = sim.batch_params(dtype=np.float32)
        from lightdock_tpu.engine.energy_batch import ensure_dfire_types
        params = ensure_dfire_types(params)
        rng = np.random.RandomState(0)
        g = 200
        t = rng.uniform(-30, 30, (g, 3)).astype(np.float32)
        q = rng.standard_normal((g, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        pose = (jnp.asarray(t), jnp.asarray(q),
                jnp.zeros((g, 0), jnp.float32), jnp.zeros((g, 0), jnp.float32))
    else:
        params, pose = _toy("dfire", n_rec=1615, n_lig=221, g=200)
    dp = device_params(params, np.float32)
    compiled = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    interp = make_pallas_energy_fn(params, kernel="v2",
                                   interpret=True)(dp, *pose)
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                               rtol=2e-5, atol=2e-5)


def test_compiled_worklist_matches_interpret_toy(monkeypatch):
    """Work-list grid compiled on the chip (scalar-prefetch-driven index
    maps are exactly the machinery only Mosaic compilation validates)."""
    _require_tpu()
    import jax

    from lightdock_tpu.engine.energy_pallas import make_pallas_energy_fn
    from lightdock_tpu.engine.gso_jax import device_params
    from lightdock_tpu.ops import pallas_energy as pe

    monkeypatch.setattr(pe, "V2_WORKLIST", True)
    params, pose = _toy("dfire")
    dp = device_params(params, np.float32)
    compiled = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    interp = make_pallas_energy_fn(params, kernel="v2",
                                   interpret=True)(dp, *pose)
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp),
                               rtol=2e-5, atol=2e-5)


def test_compiled_ev_far_bits_off_matches_default(monkeypatch):
    """DNA kernel with the vdw-tier far bits toggled off must equal the
    default (bits-on) kernel bit-for-bit on the chip: the skipped far
    -chunk vdw work is provably zero."""
    _require_tpu()
    import jax

    from lightdock_tpu.engine.energy_pallas import make_pallas_energy_fn
    from lightdock_tpu.engine.gso_jax import device_params
    from lightdock_tpu.ops import pallas_energy as pe

    params, pose = _toy("dna")
    dp = device_params(params, np.float32)
    on = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    monkeypatch.setattr(pe, "V2_EV_FAR_BITS", False)
    off = jax.jit(make_pallas_energy_fn(params, kernel="v2"))(dp, *pose)
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))
