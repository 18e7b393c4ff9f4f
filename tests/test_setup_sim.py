"""Native setup generation -> simulation -> analysis: the full pipeline
without external lightdock3 tooling."""

import json

import numpy as np
import pytest

from lightdock_tpu.setup_sim import (SetupConfig, fibonacci_directions,
                                     run_setup, swarm_centers)
from lightdock_tpu.utils.pdb import parse_pdb


def test_fibonacci_directions_uniformish():
    d = fibonacci_directions(64)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0)
    assert np.abs(d.mean(axis=0)).max() < 0.1


def test_swarm_centers_outside_receptor(reference_dir):
    rec = parse_pdb(reference_dir / "tests/2oob/2oob_receptor.pdb")
    lig = parse_pdb(reference_dir / "tests/2oob/2oob_ligand.pdb")
    centers = swarm_centers(rec.coordinates, lig.coordinates, 12)
    assert centers.shape == (12, 3)
    lig_radius = np.linalg.norm(
        lig.coordinates - lig.coordinates.mean(axis=0), axis=1).max()
    # every center keeps a full ligand radius of clearance from every
    # receptor atom
    for c in centers:
        dmin = np.linalg.norm(rec.coordinates - c, axis=1).min()
        assert dmin >= lig_radius, (dmin, lig_radius)


def test_full_native_pipeline(tmp_path, reference_dir):
    """setup -> simulate (3 steps, jax engine, CPU) -> rank, entirely from
    this framework's own tools on raw PDBs."""
    cfg = SetupConfig(
        receptor_pdb=str(reference_dir / "tests/2oob/2oob_receptor.pdb"),
        ligand_pdb=str(reference_dir / "tests/2oob/2oob_ligand.pdb"),
        swarms=3, glowworms=20)
    setup = run_setup(cfg, tmp_path)
    assert (tmp_path / "setup.json").exists()
    assert len(list((tmp_path / "init").glob("initial_positions_*.dat"))) == 3
    rows = np.loadtxt(tmp_path / "init/initial_positions_0.dat")
    assert rows.shape == (20, 7)
    assert np.allclose(np.linalg.norm(rows[:, 3:7], axis=1), 1.0, atol=1e-9)

    # determinism of the generator
    run_setup(cfg, tmp_path / "again")
    a = (tmp_path / "init/initial_positions_1.dat").read_text()
    b = (tmp_path / "again/init/initial_positions_1.dat").read_text()
    assert a == b

    import os
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        from lightdock_tpu.cli import main as cli_main
        rc = cli_main([str(tmp_path / "setup.json"),
                       str(tmp_path / "init/initial_positions_*.dat"),
                       "3", "dfire", "--platform", "cpu", "--dtype", "float32"])
        assert rc == 0
    finally:
        os.chdir(cwd)
    for s in range(3):
        assert (tmp_path / f"swarm_{s}/gso_1.out").exists()

    from lightdock_tpu import analysis
    ranked = analysis.rank_swarms(tmp_path, 1,
                                  only_cluster_representatives=False)
    assert len(ranked) == 60
    assert all(np.isfinite(r.scoring) for r in ranked)
