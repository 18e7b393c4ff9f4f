"""PDB parsing, setup parsing, positions parsing, output writer."""

import numpy as np
import pytest

from lightdock_tpu.utils.output import format_gso_output, read_gso_output
from lightdock_tpu.utils.pdb import parse_pdb
from lightdock_tpu.utils.positions import parse_positions, parse_swarm_id, split_positions
from lightdock_tpu.utils.setupfile import SetupFile

pytestmark = pytest.mark.quick


def test_parse_pdb_1azp(reference_dir):
    s = parse_pdb(reference_dir / "tests/1azp/1azp_receptor.pdb")
    assert s.num_atoms == 1094
    assert s.atom_names[0] == "N"
    assert s.res_names[0] == "MET"
    assert s.res_ids[0] == "A.MET.1"
    assert np.allclose(s.coordinates[0], [12.131, 7.656, 30.700])

    lig = parse_pdb(reference_dir / "tests/1azp/1azp_ligand.pdb")
    assert lig.num_atoms == 506


def test_setupfile_permissive(reference_dir):
    # 1azp setup.json has extra keys (flip, surface_density, ...) and no seed.
    setup = SetupFile.from_file(reference_dir / "example/1azp/setup.json")
    assert setup.seed == 324324
    assert setup.use_anm and setup.anm_rec == 10 and setup.anm_lig == 10
    active, passive = setup.restraints("receptor")
    assert active == ["A.TRP.24", "A.VAL.26", "A.ARG.42"]
    assert passive == []


def test_positions_roundtrip(reference_dir):
    path = reference_dir / "example/1azp/initial_positions_0.dat"
    pos = parse_positions(path)
    assert pos.shape == (200, 27)
    assert parse_swarm_id(path) == 0
    t, q, ar, al = split_positions(pos, True, 10, 10)
    assert t.shape == (200, 3) and q.shape == (200, 4)
    assert ar.shape == (200, 10) and al.shape == (200, 10)
    t2, q2, ar2, al2 = split_positions(pos, False, 10, 10)
    assert ar2.shape == (200, 0) and al2.shape == (200, 0)


def test_gso_writer_matches_golden(reference_dir):
    """Re-render a shipped golden from its parsed values: the formatted
    text must be byte-identical (format of reference src/swarm.rs:128-167)."""
    golden_path = reference_dir / "example/1azp/swarm_0/gso_1.out"
    golden = golden_path.read_text()
    poses, luc, nn, vis, sco = read_gso_output(golden_path)
    rendered = format_gso_output(poses, luc, nn, vis, sco)
    assert rendered == golden


def test_gso_writer_no_anm_golden(reference_dir):
    golden_path = reference_dir / "example/1ppe/swarm_0/gso_100.out"
    golden = golden_path.read_text()
    poses, luc, nn, vis, sco = read_gso_output(golden_path)
    assert poses.shape[1] == 7
    assert format_gso_output(poses, luc, nn, vis, sco) == golden
