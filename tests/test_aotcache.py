"""AOT executable cache (utils.aotcache): round-trip, keying, fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightdock_tpu.utils.aotcache import AotDispatch, compile_cached

pytestmark = pytest.mark.quick


def test_dispatch_matches_jit(tmp_path):
    def fn(x, y):
        return (x @ y).sum(axis=1)

    x = jnp.asarray(np.random.RandomState(0).rand(8, 8), jnp.float32)
    d = AotDispatch(fn, label="t", cache_dir=tmp_path)
    out = d(x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.jit(fn)(x, x)),
                               rtol=1e-6)
    assert d.stats == ["miss"]
    assert len(list(tmp_path.glob("t-*.aotx"))) == 1

    # A FRESH dispatcher (fresh process stand-in) must hit the cache.
    d2 = AotDispatch(fn, label="t", cache_dir=tmp_path)
    out2 = d2(x, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=0)
    assert d2.stats == ["hit"]

    # A different shape is a different executable: new miss, old file kept.
    y = jnp.asarray(np.random.RandomState(1).rand(16, 16), jnp.float32)
    d2(y, y)
    assert d2.stats == ["hit", "miss"]
    assert len(list(tmp_path.glob("t-*.aotx"))) == 2


def test_no_cache_dir_is_plain_jit():
    def fn(x):
        return x * 2

    d = AotDispatch(fn, cache_dir=None)
    import os
    if "LIGHTDOCK_AOT_CACHE" in os.environ:
        pytest.skip("env cache configured")
    out = d(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))
    assert d.stats == []


def test_corrupt_cache_falls_back(tmp_path):
    def fn(x):
        return x + 1

    x = jnp.ones(8)
    d = AotDispatch(fn, label="c", cache_dir=tmp_path)
    d(x)
    (path,) = tmp_path.glob("c-*.aotx")
    path.write_bytes(b"garbage")
    d2 = AotDispatch(fn, label="c", cache_dir=tmp_path)
    out = d2(x)
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(8))
    assert d2.stats == ["load-failed"]


def test_runner_with_cache(tmp_path, monkeypatch):
    """GsoJaxRunner end-to-end with LIGHTDOCK_AOT_CACHE: second runner
    reuses the stored executable and reproduces the trajectory exactly."""
    monkeypatch.setenv("LIGHTDOCK_AOT_CACHE", str(tmp_path))
    from lightdock_tpu.engine.energy_batch import build_batch_params
    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.scoring.models import DockingModel
    from lightdock_tpu.scoring.potentials import synthetic_potential

    rng = np.random.RandomState(3)

    def model(n):
        return DockingModel(
            method="dfire", coordinates=rng.uniform(-8, 8, (n, 3)),
            num_anm=0, nmodes=np.zeros((0, n, 3)),
            membrane=np.zeros(0, np.int64), active_restraints={},
            passive_restraints={},
            atom_types=rng.randint(0, 168, n).astype(np.int32))

    params = build_batch_params(model(24), model(12), use_anm=False,
                                potential=synthetic_potential())
    pos = np.concatenate([rng.uniform(-5, 5, (8, 3)),
                          rng.standard_normal((8, 4))], axis=1)
    pos[:, 3:7] /= np.linalg.norm(pos[:, 3:7], axis=1, keepdims=True)

    def run():
        r = GsoJaxRunner(params, pos, seed=7, use_anm=False, anm_rec=0,
                         anm_lig=0, dtype=jnp.float32)
        final, _ = r.run(3)
        return np.asarray(final.scoring), r._run_jit.stats

    s1, stats1 = run()
    assert stats1 == ["miss"]
    s2, stats2 = run()
    assert stats2 == ["hit"]
    np.testing.assert_array_equal(s1, s2)
