"""End-to-end golden reproduction: host parity engine vs shipped outputs.

The 1azp protein-DNA example (dna scoring, ANM 10+10, restraints, seed
324324) is fully reproducible without external data assets.  The parity
engine must render gso_1.out and gso_10.out byte-identically to the
goldens shipped with the reference (example/1azp/swarm_0/).
"""

import pytest

from lightdock_tpu.engine.gso_host import GsoHostEngine
from lightdock_tpu.simulation import load_simulation
from lightdock_tpu.utils.output import format_gso_output


@pytest.mark.quick
def test_1azp_golden_trajectory_jax_engine(reference_dir, tmp_path):
    """The batched device engine itself (float64, CPU backend) must render
    gso_1.out and gso_10.out byte-identically to the shipped goldens —
    the vectorised reformulation is exact, not merely close."""
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner

    ex = reference_dir / "example/1azp"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dna", anm_dir=ex)
    runner = GsoJaxRunner(sim.batch_params(), sim.positions, sim.seed,
                          sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig,
                          output_directory=str(tmp_path), dtype=jnp.float64,
                          energy_chunk=25)
    runner.run_segmented(10, 10)
    for step in (1, 10):
        golden = (ex / f"swarm_0/gso_{step}.out").read_text()
        assert (tmp_path / f"gso_{step}.out").read_text() == golden


@pytest.mark.quick
def test_1ppe_golden_trajectory_dfire(reference_dir, tmp_path):
    """DFIRE end-to-end golden (1ppe, seed 324324, no ANM): byte-identical
    gso_1.out / gso_10.out from the device engine.

    Skipped-not-absent when the real DFIRE table is unavailable: the
    synthetic stand-in produces valid but different scores, so the shipped
    goldens only verify where data/DCparams exists (mirrors the guarded
    2oob anchor in test_energy.py).
    """
    from lightdock_tpu.scoring.potentials import dfire_data_path
    if not dfire_data_path().exists():
        pytest.skip("real DFIRE table (DCparams) not available in this env")
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner

    ex = reference_dir / "example/1ppe"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire", anm_dir=ex)
    runner = GsoJaxRunner(sim.batch_params(), sim.positions, sim.seed,
                          sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig,
                          output_directory=str(tmp_path), dtype=jnp.float64,
                          energy_chunk=25)
    runner.run_segmented(10, 10)
    for step in (1, 10):
        golden = (ex / f"swarm_0/gso_{step}.out").read_text()
        assert (tmp_path / f"gso_{step}.out").read_text() == golden


SELF_GOLDENS = [
    # (example, golden dir, scoring) — DFIRE trajectories pinned against the
    # deterministic synthetic table (scoring/potentials.synthetic_potential):
    # the environment lacks data/DCparams, so these committed self-goldens
    # (scripts/make_self_goldens.py, f64 host engine) are the fixed external
    # truth for DFIRE end-to-end, mirroring the reference's shipped 1ppe
    # goldens (reference example/1ppe/swarm_0/gso_1.out).
    ("1ppe", "1ppe_synth"),   # DFIRE, no ANM
    ("2uuy", "2uuy_synth"),   # DFIRE, ANM 10+10
]


@pytest.mark.parametrize("example,golden", SELF_GOLDENS)
def test_dfire_self_golden_jax_engine(reference_dir, tmp_path, example,
                                      golden, goldens_dir):
    """The batched device engine (float64, CPU) must render the committed
    synthetic-table DFIRE goldens byte-identically."""
    import jax.numpy as jnp

    from lightdock_tpu.engine.gso_jax import GsoJaxRunner

    ex = reference_dir / f"example/{example}"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire", anm_dir=ex)
    runner = GsoJaxRunner(sim.batch_params(), sim.positions, sim.seed,
                          sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig,
                          output_directory=str(tmp_path), dtype=jnp.float64,
                          energy_chunk=25)
    runner.run_segmented(10, 10)
    for step in (1, 10):
        want = (goldens_dir / golden / f"gso_{step}.out").read_text()
        assert (tmp_path / f"gso_{step}.out").read_text() == want


@pytest.mark.slow
@pytest.mark.parametrize("example,golden", SELF_GOLDENS)
def test_dfire_self_golden_host_engine(reference_dir, example, golden,
                                       goldens_dir):
    """The sequential host parity engine reproduces the same goldens (it
    generated them; this guards against regressions in either engine)."""
    ex = reference_dir / f"example/{example}"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire", anm_dir=ex)
    engine = GsoHostEngine(sim.batch_params(), sim.positions, sim.seed,
                           sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig)
    rendered = {}

    def snap(e, step):
        if step in (1, 10):
            rendered[step] = format_gso_output(
                e.poses(), e.luciferin, e.num_neighbors, e.vision, e.scoring)

    engine.run(10, on_step=snap)
    for step in (1, 10):
        want = (goldens_dir / golden / f"gso_{step}.out").read_text()
        assert rendered[step] == want


@pytest.mark.slow
def test_1azp_golden_horizon_step80(reference_dir):
    """The sequential f64 host engine tracks the reference's shipped 1azp
    goldens byte-identically through step 80 of 100 (the documented
    divergence horizon, CLAUDE.md/COMPONENTS.md — beyond it, chaotic
    sensitivity to last-ulp rounding takes over).  Guards regressions in
    summation/selection order that would shorten the horizon.  (The
    batched device engine's own horizon is step 40: cross-pose reduction
    order differs from the reference's sequential loops sooner.)"""
    ex = reference_dir / "example/1azp"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dna", anm_dir=ex)
    engine = GsoHostEngine(sim.batch_params(), sim.positions, sim.seed,
                           sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig)
    checkpoints = (20, 30, 40, 50, 60, 70, 80)
    rendered = {}

    def snap(e, step):
        if step in checkpoints:
            rendered[step] = format_gso_output(
                e.poses(), e.luciferin, e.num_neighbors, e.vision, e.scoring)

    engine.run(80, on_step=snap)
    for step in checkpoints:
        golden = (ex / f"swarm_0/gso_{step}.out").read_text()
        assert rendered[step] == golden, (
            f"divergence horizon regressed: step {step} differs")


@pytest.mark.slow
def test_1azp_golden_trajectory(reference_dir):
    ex = reference_dir / "example/1azp"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dna", anm_dir=ex)
    assert sim.seed == 324324 and sim.use_anm

    engine = GsoHostEngine(sim.batch_params(), sim.positions, sim.seed,
                           sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig)

    rendered = {}

    def snap(e, step):
        if step in (1, 10):
            rendered[step] = format_gso_output(
                e.poses(), e.luciferin, e.num_neighbors, e.vision, e.scoring)

    engine.run(10, on_step=snap)

    for step in (1, 10):
        golden = (ex / f"swarm_0/gso_{step}.out").read_text()
        assert rendered[step] == golden, f"step {step} differs from golden"
