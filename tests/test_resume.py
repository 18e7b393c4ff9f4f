"""Checkpoint/resume: a run resumed from a gso_N.out snapshot must exactly
continue the uninterrupted trajectory (the snapshot holds the full state;
the RNG position is reconstructed from the step number)."""

import jax.numpy as jnp
import numpy as np

from lightdock_tpu.engine.energy_batch import build_batch_params
from lightdock_tpu.engine.gso_jax import GsoJaxRunner
from lightdock_tpu.scoring.models import DockingModel
from lightdock_tpu.scoring.potentials import synthetic_potential


def _system(seed=3, g=16, num_anm=2):
    rng = np.random.RandomState(seed)

    def model(n):
        return DockingModel(
            method="dfire",
            coordinates=rng.uniform(-8, 8, size=(n, 3)),
            num_anm=num_anm,
            nmodes=rng.standard_normal((num_anm, n, 3)) * 0.1,
            membrane=np.zeros(0, dtype=np.int64),
            active_restraints={}, passive_restraints={},
            atom_types=rng.randint(0, 168, size=n).astype(np.int32))

    params = build_batch_params(model(25), model(19), use_anm=True,
                                potential=synthetic_potential())
    pos = np.concatenate([
        rng.uniform(-5, 5, (g, 3)), rng.standard_normal((g, 4)),
        rng.uniform(-1, 1, (g, num_anm)), rng.uniform(-1, 1, (g, num_anm))],
        axis=1)
    pos[:, 3:7] /= np.linalg.norm(pos[:, 3:7], axis=1, keepdims=True)
    return params, pos, num_anm


def test_resume_continues_trajectory(tmp_path):
    params, pos, k = _system()
    outdir = tmp_path / "full"
    full = GsoJaxRunner(params, pos, seed=324324, use_anm=True, anm_rec=k,
                        anm_lig=k, output_directory=str(outdir),
                        dtype=jnp.float64)
    full.run(20)

    outdir2 = tmp_path / "resumed"
    resumed = GsoJaxRunner(params, pos, seed=324324, use_anm=True, anm_rec=k,
                           anm_lig=k, output_directory=str(outdir2),
                           dtype=jnp.float64)
    resumed.load_snapshot(outdir / "gso_10.out")
    resumed.run(20)

    # The .npz sidecar holds the exact device bits, so resume must be
    # bit-identical to the uninterrupted run — no tolerance.
    a = (outdir / "gso_20.out").read_text()
    b = (outdir2 / "gso_20.out").read_text()
    assert a == b
    np.testing.assert_array_equal(np.asarray(full.state.t),
                                  np.asarray(resumed.state.t))
    assert np.array_equal(np.asarray(full.state.num_neighbors),
                          np.asarray(resumed.state.num_neighbors))

    # The resumed run must not rewrite pre-resume snapshots.
    assert not (outdir2 / "gso_10.out").exists()
    assert (outdir2 / "gso_20.out").exists()


def test_resume_from_text_snapshot(tmp_path):
    """Without a sidecar (e.g. a reference-produced gso_N.out), resume
    parses the quantized text file; the trajectory continues approximately
    (7/8-decimal perturbation) and the step must be given explicitly."""
    import pytest

    from lightdock_tpu.utils.output import sidecar_path

    params, pos, k = _system()
    outdir = tmp_path / "full"
    full = GsoJaxRunner(params, pos, seed=324324, use_anm=True, anm_rec=k,
                        anm_lig=k, output_directory=str(outdir),
                        dtype=jnp.float64)
    full.run(20)
    sidecar_path(outdir / "gso_10.out").unlink()

    outdir2 = tmp_path / "resumed"
    resumed = GsoJaxRunner(params, pos, seed=324324, use_anm=True, anm_rec=k,
                           anm_lig=k, output_directory=str(outdir2),
                           dtype=jnp.float64)
    with pytest.raises(ValueError, match="no sidecar"):
        resumed.load_snapshot(outdir / "gso_10.out")
    resumed.load_snapshot(outdir / "gso_10.out", 10)
    resumed.run(20)
    np.testing.assert_allclose(np.asarray(resumed.state.t),
                               np.asarray(full.state.t), rtol=0, atol=1e-3)
    assert np.array_equal(np.asarray(full.state.num_neighbors),
                          np.asarray(resumed.state.num_neighbors))


def test_resume_noop_when_done(tmp_path):
    params, pos, k = _system()
    r = GsoJaxRunner(params, pos, seed=1, use_anm=True, anm_rec=k, anm_lig=k,
                     dtype=jnp.float64)
    r.run(5)
    state, outs = r.run(5)  # already at step 5: no-op
    assert outs is None
