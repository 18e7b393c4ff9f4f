"""Analysis pipeline: conformations, BSAS clustering, ranking, top-N."""

import numpy as np
import pytest

from lightdock_tpu import analysis
from lightdock_tpu.utils.output import write_gso_output
from lightdock_tpu.utils.pdb import parse_pdb


def _fake_swarm(tmp_path, swarm_id, scores, seed=0, step=10, d=7):
    rng = np.random.RandomState(seed + swarm_id)
    g = len(scores)
    poses = np.concatenate([
        rng.uniform(-10, 10, (g, 3)),
        rng.standard_normal((g, 4))], axis=1)
    poses[:, 3:7] /= np.linalg.norm(poses[:, 3:7], axis=1, keepdims=True)
    outdir = tmp_path / f"swarm_{swarm_id}"
    outdir.mkdir()
    write_gso_output(outdir / f"gso_{step}.out", poses,
                     np.asarray(scores) * 0.4, np.zeros(g, dtype=int),
                     np.full(g, 0.2), np.asarray(scores, dtype=float))
    return poses


def test_rank_merges_and_sorts(tmp_path):
    _fake_swarm(tmp_path, 0, [5.0, 1.0, 3.0])
    _fake_swarm(tmp_path, 1, [4.0, 6.0])
    ranked = analysis.rank_swarms(tmp_path, 10,
                                  only_cluster_representatives=False)
    assert [r.scoring for r in ranked] == [6.0, 5.0, 4.0, 3.0, 1.0]
    assert ranked[0].swarm == 1 and ranked[0].glowworm == 1
    text = (tmp_path / "rank_by_scoring.list").read_text()
    assert text.startswith("Swarm  Glowworm")
    assert len(text.splitlines()) == 6


def test_rank_metrics_rmsd_and_clashes(tmp_path, reference_dir):
    """With pose metrics wired in, the rank file carries real RMSD and
    clash values (the reference pipeline's lgd_rank columns, reference
    example/1czy/analysis.sh:27-32)."""
    lig_pdb = reference_dir / "tests/2oob/2oob_ligand.pdb"
    rec_pdb = reference_dir / "tests/2oob/2oob_receptor.pdb"
    lig = parse_pdb(lig_pdb)

    # Identity pose (zero translation, unit quaternion) + one shifted pose.
    poses = np.zeros((2, 7))
    poses[:, 3] = 1.0
    poses[1, :3] = (3.0, 0.0, 0.0)
    outdir = tmp_path / "swarm_0"
    outdir.mkdir()
    write_gso_output(outdir / "gso_10.out", poses, np.zeros(2),
                     np.zeros(2, dtype=int), np.full(2, 0.2),
                     np.array([5.0, 1.0]))

    # Reference ligand = the ligand itself => identity pose has RMSD 0 and
    # the shifted pose exactly 3 A (rigid x-shift).
    metrics = analysis.make_pose_metrics(rec_pdb, lig_pdb, None, False, 0, 0,
                                         reference_pdb=lig_pdb)
    ranked = analysis.rank_swarms(tmp_path, 10, pose_metrics=metrics,
                                  only_cluster_representatives=False)
    by_g = {r.glowworm: r for r in ranked}
    assert by_g[0].rmsd == pytest.approx(0.0, abs=1e-12)
    assert by_g[1].rmsd == pytest.approx(3.0, abs=1e-9)
    # 2oob ligand placed at its crystallographic pose clashes with the
    # receptor interface (bound complex => contacts < 1.9 A are rare but
    # the count must be a nonnegative integer; exactness checked against
    # the brute-force pair count).
    rec = parse_pdb(rec_pdb)
    d = np.linalg.norm(rec.coordinates[:, None, :]
                       - lig.coordinates[None, :, :], axis=-1)
    assert by_g[0].clashes == int((d < 1.9).sum())
    text = (tmp_path / "rank_by_scoring.list").read_text()
    line0 = [ln for ln in text.splitlines()[1:] if " 0 (" in ln or
             ln.split()[1] == "0"][0]
    assert " 0.000 " in line0  # real RMSD rendered, not -1.000


def test_count_clashes_chunking_matches_bruteforce():
    rng = np.random.RandomState(3)
    rec = rng.uniform(-10, 10, (137, 3))
    lig = rng.uniform(-10, 10, (4, 29, 3))
    d = np.linalg.norm(rec[None, :, None, :] - lig[:, None, :, :], axis=-1)
    expected = (d < 5.0).sum(axis=(1, 2))
    got = analysis.count_clashes(rec, lig, cutoff=5.0)
    assert np.array_equal(got, expected)


def test_cluster_bsas_groups_similar_poses():
    rng = np.random.RandomState(1)
    base = rng.uniform(-5, 5, (30, 3))
    # Three well-separated pose clusters of transformed coordinates.
    coords = np.stack([base + off for off in
                       [(0, 0, 0), (0.1, 0, 0), (50, 0, 0), (50.2, 0, 0),
                        (0, 80, 0)]])
    scoring = np.array([1.0, 5.0, 3.0, 2.0, 4.0])
    clusters = analysis.cluster_bsas(coords, scoring, cutoff=4.0)
    assert len(clusters) == 3
    # Best-scoring pose of each spatial group is its representative.
    reps = sorted(c.representative for c in clusters)
    assert reps == [1, 2, 4]
    sizes = sorted(len(c.members) for c in clusters)
    assert sizes == [1, 2, 2]


def test_generate_and_top_roundtrip(tmp_path, reference_dir):
    lig_pdb = reference_dir / "tests/2oob/2oob_ligand.pdb"
    rec_pdb = reference_dir / "tests/2oob/2oob_receptor.pdb"
    poses = _fake_swarm(tmp_path, 0, [2.0, 7.0, 4.0])

    files = analysis.generate_conformations(
        lig_pdb, tmp_path / "swarm_0/gso_10.out", tmp_path / "swarm_0",
        None, False, 0, 0)
    assert len(files) == 3
    lig = parse_pdb(lig_pdb)
    regen = parse_pdb(files[1])
    assert regen.num_atoms == lig.num_atoms
    expected = analysis.transform_ligand_batch(
        lig.coordinates, np.zeros((0, lig.num_atoms, 3)), poses, False, 0, 0)[1]
    assert np.allclose(regen.coordinates, expected, atol=1.5e-3)

    ranked = analysis.rank_swarms(tmp_path, 10,
                                  only_cluster_representatives=False)
    tops = analysis.write_top(rec_pdb, lig_pdb, ranked, tmp_path / "top",
                              None, False, 0, 0, top_n=2)
    assert len(tops) == 2
    merged = parse_pdb(tops[0])
    rec = parse_pdb(rec_pdb)
    assert merged.num_atoms == rec.num_atoms + lig.num_atoms
    # top_1 is the best pose (scoring 7.0 => glowworm 1 of swarm 0)
    assert ranked[0].glowworm == 1


def test_cluster_repr_format(tmp_path, reference_dir):
    lig_pdb = reference_dir / "tests/2oob/2oob_ligand.pdb"
    _fake_swarm(tmp_path, 0, [2.0, 7.0, 4.0])
    clusters = analysis.cluster_swarm_dir(
        tmp_path / "swarm_0", lig_pdb, 10, None, False, 0, 0)
    lines = (tmp_path / "swarm_0/cluster.repr").read_text().splitlines()
    assert len(lines) == len(clusters)
    first = lines[0].split(":")
    assert len(first) == 5
    assert first[4].startswith("lightdock_") and first[4].endswith(".pdb")
    # representatives ranked by scoring: first cluster's rep is glowworm 1
    assert int(first[3]) == 1
