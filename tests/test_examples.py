"""Model building on the remaining shipped examples: membrane (1k4c),
insertion-code restraints (ab_icode), 2uuy/1czy ANM shapes."""

import json

import numpy as np
import pytest

from lightdock_tpu.scoring.models import build_model
from lightdock_tpu.scoring.potentials import synthetic_potential
from lightdock_tpu.simulation import load_simulation
from lightdock_tpu.utils.pdb import parse_pdb
from lightdock_tpu.utils.setupfile import SetupFile


def test_1k4c_membrane_model(reference_dir):
    """Membrane beads (MMB.BJ records) must be detected and typed 167
    (reference src/dfire.rs:146-149 + ATOMRES row 20)."""
    ex = reference_dir / "example/1k4c"
    rec = parse_pdb(ex / "lightdock_receptor_membrane.pdb")
    model = build_model(rec, "dfire")
    assert model.membrane.size > 0
    assert (model.atom_types[model.membrane] == 167).all()
    # membrane beads live in their own MMB residues
    assert all(rec.res_names[i] == "MMB" for i in model.membrane)


@pytest.mark.slow
def test_1k4c_end_to_end_membrane_bias(reference_dir):
    """Two host-engine steps on the full 1k4c complex (3413x3268 atoms,
    membrane penalty active) with the synthetic table."""
    ex = reference_dir / "example/1k4c"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire")
    assert sim.receptor.membrane.size > 0
    from lightdock_tpu.engine.gso_host import GsoHostEngine
    eng = GsoHostEngine(sim.batch_params(), sim.positions[:8], sim.seed,
                        sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig,
                        energy_chunk=4)
    eng.run(1)
    assert np.isfinite(eng.scoring).all()


def test_ab_icode_restraints(reference_dir):
    """Insertion-code restraint ids like H.ASP.52A must resolve to atoms
    (reference src/dfire.rs:139-142; example/ab_icode exercises this)."""
    ex = reference_dir / "example/ab_icode"
    if not (ex / "setup.json").exists():
        pytest.skip("ab_icode example not present")
    setup = SetupFile.from_file(ex / "setup.json")
    active, passive = setup.restraints("receptor")
    icode_ids = [r for r in active + passive
                 if r and not r[-1].isdigit()]
    assert icode_ids, "expected insertion-code restraints in ab_icode"
    rec = parse_pdb(ex / f"lightdock_{setup.receptor_pdb}")
    model = build_model(rec, "dfire", active, passive)
    found = set(model.active_restraints) | set(model.passive_restraints)
    for rid in icode_ids:
        assert rid in found, f"restraint {rid} not mapped to any atom"


def test_2uuy_1czy_anm_shapes(reference_dir):
    for name, method in (("2uuy", "dfire"), ("1czy", "dfire")):
        ex = reference_dir / "example" / name
        if not (ex / "setup.json").exists():
            continue
        setup = SetupFile.from_file(ex / "setup.json")
        if not setup.use_anm:
            continue
        rec_nm = np.load(ex / "rec_nm.npy")
        rec = parse_pdb(ex / f"lightdock_{setup.receptor_pdb}")
        assert rec_nm.size == rec.num_atoms * 3 * setup.anm_rec
