"""Post-simulation analysis: conformations, clustering, ranking, top-N.

The reference delegates this stage to external lightdock3 tools driven by
shell scripts (reference example/1czy/analysis.sh:10-35:
lgd_generate_conformations.py, lgd_cluster_bsas.py, lgd_rank.py,
lgd_top.py).  This module provides the same workflow natively:

* ``generate_conformations`` — apply glowworm poses (rotation +
  translation + ANM) to the ligand structure and write one PDB per pose.
* ``cluster_bsas`` — BSAS clustering of a swarm's poses by ligand-atom
  RMSD (poses visited best-scoring first; a pose joins the first cluster
  whose representative is within the cutoff), writing ``cluster.repr``
  lines ``cluster_id:size:scoring:glowworm_id:lightdock_N.pdb`` (format
  observed in reference example/1czy/swarm_0/cluster.repr).
* ``rank_swarms`` — merge all swarms' snapshots at a step, sort by
  scoring, write ``rank_by_scoring.list``.
* ``write_top`` — emit merged receptor+ligand PDBs for the best N poses.

Pose transforms reuse the engine's batched math (all poses at once).
"""

from __future__ import annotations

import dataclasses
import pathlib
import re
from typing import List, Optional, Sequence

import numpy as np

from .ops import quaternion as qt
from .utils.output import read_gso_output
from .utils.positions import split_positions

DEFAULT_RMSD_CUTOFF = 4.0  # lightdock3 BSAS default (Angstrom)


# -- pose application -------------------------------------------------------


def transform_ligand_batch(lig_coords: np.ndarray, nmodes: np.ndarray,
                           poses: np.ndarray, use_anm: bool,
                           anm_rec: int, anm_lig: int) -> np.ndarray:
    """(G, Nl, 3) transformed ligand coordinates for all poses.

    Applies the reference pose semantics (rotate, translate, ANM —
    reference src/dfire.rs:282-302).  ``nmodes`` is the ligand's
    (anm_lig, Nl, 3) mode tensor.
    """
    t, q, _a_rec, a_lig = split_positions(poses, use_anm, anm_rec, anm_lig)
    rot = qt.rotation_matrix(q)                            # (G, 3, 3)
    out = np.einsum("gab,nb->gna", rot, lig_coords) + t[:, None, :]
    if use_anm and a_lig.shape[1] > 0:
        out = out + np.einsum("gk,knc->gnc", a_lig, nmodes)
    return out


def rewrite_pdb_coords(src_path, coords: np.ndarray, out_handle,
                       serial_offset: int = 0) -> int:
    """Copy ATOM/HETATM records of ``src_path`` with replaced coordinates.

    Returns the number of atom records written; non-atom records are
    skipped.  Atom serials are renumbered sequentially starting at
    ``serial_offset`` + 1.
    """
    i = 0
    for line in pathlib.Path(src_path).read_text().splitlines():
        rec = line[:6]
        if rec != "ATOM  " and rec != "HETATM":
            continue
        if len(line) < 54:
            line = line.ljust(54)
        x, y, z = coords[i]
        serial = serial_offset + i + 1
        out_handle.write(
            f"{line[:6]}{min(serial, 99999):5d}{line[11:30]}"
            f"{x:8.3f}{y:8.3f}{z:8.3f}{line[54:]}\n")
        i += 1
    return i


def generate_conformations(ligand_pdb, gso_out, output_dir,
                           nmodes: Optional[np.ndarray],
                           use_anm: bool, anm_rec: int, anm_lig: int,
                           num: Optional[int] = None) -> List[pathlib.Path]:
    """Write lightdock_N.pdb for each pose of a gso_N.out snapshot."""
    from .utils.pdb import parse_pdb

    lig = parse_pdb(ligand_pdb)
    poses, _luc, _nn, _vis, _sco = read_gso_output(gso_out)
    if num is not None:
        poses = poses[:num]
    modes = (nmodes if nmodes is not None
             else np.zeros((0, lig.num_atoms, 3)))
    coords = transform_ligand_batch(lig.coordinates, modes, poses,
                                    use_anm, anm_rec, anm_lig)
    outdir = pathlib.Path(output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    written = []
    for g in range(coords.shape[0]):
        path = outdir / f"lightdock_{g}.pdb"
        with open(path, "w") as fh:
            rewrite_pdb_coords(ligand_pdb, coords[g], fh)
            fh.write("END\n")
        written.append(path)
    return written


# -- clustering -------------------------------------------------------------


def pose_rmsd_matrix(coords: np.ndarray) -> np.ndarray:
    """(G, G) pairwise ligand RMSD between transformed pose coordinates."""
    g, n, _ = coords.shape
    flat = coords.reshape(g, -1)
    sq = (flat * flat).sum(axis=1)
    cross = flat @ flat.T
    msd = (sq[:, None] + sq[None, :] - 2.0 * cross) / n
    return np.sqrt(np.maximum(msd, 0.0))


@dataclasses.dataclass
class Cluster:
    representative: int
    scoring: float
    members: List[int]


def cluster_bsas(coords: np.ndarray, scoring: np.ndarray,
                 cutoff: float = DEFAULT_RMSD_CUTOFF) -> List[Cluster]:
    """BSAS clustering: visit poses best-scoring first; join the first
    cluster whose representative is within ``cutoff`` RMSD, else found a
    new cluster."""
    order = np.argsort(-scoring, kind="stable")
    rmsd = pose_rmsd_matrix(coords)
    clusters: List[Cluster] = []
    for g in order:
        for c in clusters:
            if rmsd[g, c.representative] <= cutoff:
                c.members.append(int(g))
                break
        else:
            clusters.append(Cluster(int(g), float(scoring[g]), [int(g)]))
    return clusters


def write_cluster_repr(clusters: Sequence[Cluster], path) -> None:
    with open(path, "w") as fh:
        for i, c in enumerate(clusters):
            fh.write(f"{i}:{len(c.members)}:{c.scoring:.5f}:"
                     f"{c.representative}:lightdock_{c.representative}.pdb\n")


def cluster_swarm_dir(swarm_dir, ligand_pdb, step: int,
                      nmodes: Optional[np.ndarray], use_anm: bool,
                      anm_rec: int, anm_lig: int,
                      cutoff: float = DEFAULT_RMSD_CUTOFF) -> List[Cluster]:
    """Cluster one swarm's gso_{step}.out; writes swarm_dir/cluster.repr."""
    from .utils.pdb import parse_pdb

    swarm_dir = pathlib.Path(swarm_dir)
    lig = parse_pdb(ligand_pdb)
    poses, _l, _n, _v, sco = read_gso_output(swarm_dir / f"gso_{step}.out")
    modes = (nmodes if nmodes is not None
             else np.zeros((0, lig.num_atoms, 3)))
    coords = transform_ligand_batch(lig.coordinates, modes, poses,
                                    use_anm, anm_rec, anm_lig)
    clusters = cluster_bsas(coords, sco, cutoff)
    write_cluster_repr(clusters, swarm_dir / "cluster.repr")
    return clusters


# -- per-pose quality metrics (RMSD vs a reference, clash count) -------------


def ligand_rmsd(coords: np.ndarray, ref_coords: np.ndarray) -> np.ndarray:
    """(G,) ligand RMSD of each transformed pose vs reference coordinates.

    Docking ligand-RMSD convention (no superposition: the receptor frame is
    shared), matching the RMSD column lgd_rank fills when a reference
    structure is supplied (reference example/1czy/analysis.sh:27-32 runs
    lgd_rank without one, leaving -1.000)."""
    d = coords - ref_coords[None]
    return np.sqrt((d * d).sum(axis=-1).mean(axis=-1))


def count_clashes(rec_coords: np.ndarray, lig_coords: np.ndarray,
                  cutoff: float = 1.9) -> np.ndarray:
    """(G,) steric clash counts: receptor-ligand atom pairs closer than
    ``cutoff`` (default 1.9 A, a covalent-overlap heavy-atom threshold).

    Chunked over receptor atoms to bound the (chunk, Nl) working set."""
    g = lig_coords.shape[0]
    out = np.zeros(g, dtype=np.int64)
    c2 = cutoff * cutoff
    chunk = max(1, int(2e7) // max(1, lig_coords.shape[1] * g))
    for i in range(0, rec_coords.shape[0], chunk):
        r = rec_coords[i:i + chunk]                        # (c, 3)
        d = lig_coords[:, None, :, :] - r[None, :, None, :]  # (G, c, Nl, 3)
        out += ((d * d).sum(axis=-1) < c2).sum(axis=(1, 2))
    return out


def make_pose_metrics(receptor_pdb, ligand_pdb, nmodes: Optional[np.ndarray],
                      use_anm: bool, anm_rec: int, anm_lig: int,
                      reference_pdb=None, clash_cutoff: float = 1.9):
    """Build a ``poses -> (rmsd, clashes)`` callable for rank_swarms.

    ``reference_pdb`` is a ligand structure in the receptor frame with the
    same parsed atoms as ``ligand_pdb`` (e.g. the crystallographic ligand);
    without it the RMSD column stays -1.000 like the reference pipeline's
    default run."""
    from .utils.pdb import parse_pdb

    lig = parse_pdb(ligand_pdb)
    rec = parse_pdb(receptor_pdb)
    modes = (nmodes if nmodes is not None
             else np.zeros((0, lig.num_atoms, 3)))
    ref_coords = None
    if reference_pdb is not None:
        ref = parse_pdb(reference_pdb)
        if ref.num_atoms != lig.num_atoms:
            raise ValueError(
                f"reference ligand has {ref.num_atoms} atoms, docked ligand "
                f"has {lig.num_atoms}: atom sets must match for RMSD")
        ref_coords = ref.coordinates

    def metrics(poses: np.ndarray):
        coords = transform_ligand_batch(lig.coordinates, modes, poses,
                                        use_anm, anm_rec, anm_lig)
        rmsd = (ligand_rmsd(coords, ref_coords) if ref_coords is not None
                else np.full(coords.shape[0], -1.0))
        clashes = count_clashes(rec.coordinates, coords, clash_cutoff)
        return rmsd, clashes

    return metrics


# -- ranking ----------------------------------------------------------------


@dataclasses.dataclass
class RankedPose:
    swarm: int
    glowworm: int
    pose: np.ndarray
    luciferin: float
    num_neighbors: int
    vision: float
    scoring: float
    rmsd: float = -1.0
    clashes: int = 0


def collect_swarm_results(root, step: int,
                          only_cluster_representatives: bool = True
                          ) -> List[RankedPose]:
    """Read every swarm_*/gso_{step}.out under ``root``.

    When cluster.repr files exist (and filtering is requested) only
    cluster representatives are kept, like lgd_rank.
    """
    results: List[RankedPose] = []
    root = pathlib.Path(root)
    for swarm_dir in sorted(root.glob("swarm_*"),
                            key=lambda p: int(p.name.split("_")[1])):
        m = re.fullmatch(r"swarm_(\d+)", swarm_dir.name)
        if not m:
            continue
        swarm_id = int(m.group(1))
        out_file = swarm_dir / f"gso_{step}.out"
        if not out_file.exists():
            continue
        poses, luc, nn, vis, sco = read_gso_output(out_file)
        keep = range(poses.shape[0])
        repr_file = swarm_dir / "cluster.repr"
        if only_cluster_representatives and repr_file.exists():
            keep = [int(line.split(":")[3])
                    for line in repr_file.read_text().splitlines() if line]
        for g in keep:
            results.append(RankedPose(swarm_id, int(g), poses[g], float(luc[g]),
                                      int(nn[g]), float(vis[g]), float(sco[g])))
    return results


def rank_swarms(root, step: int, out_name: str = "rank_by_scoring.list",
                only_cluster_representatives: bool = True,
                pose_metrics=None) -> List[RankedPose]:
    """Merge + sort all swarm results by scoring; write the rank file
    (layout modeled on reference example/1czy/rank_by_scoring.list).

    ``pose_metrics`` (see make_pose_metrics) fills the RMSD and Clashes
    columns with real values; without it they stay -1.000 / 0, exactly
    like the reference pipeline run without a reference structure."""
    results = collect_swarm_results(root, step, only_cluster_representatives)
    if pose_metrics is not None and results:
        poses = np.stack([r.pose for r in results])
        rmsd, clashes = pose_metrics(poses)
        for r, rm, cl in zip(results, rmsd, clashes):
            r.rmsd, r.clashes = float(rm), int(cl)
    results.sort(key=lambda r: -r.scoring)
    path = pathlib.Path(root) / out_name
    with open(path, "w") as fh:
        fh.write("Swarm  Glowworm   Coordinates"
                 + " " * 45
                 + "RecID  LigID  Luciferin  Neigh   VR     RMSD    PDB"
                 + " " * 13 + "Clashes  Scoring\n")
        for r in results:
            pose_s = ", ".join(f"{v:.3f}" for v in r.pose)
            fh.write(f"{r.swarm:5d} {r.glowworm:6d} ({pose_s})      0      0"
                     f"    {r.luciferin:.5f}     {r.num_neighbors}   "
                     f"{r.vision:.3f}   {r.rmsd:.3f} "
                     f"lightdock_{r.glowworm}.pdb      {r.clashes}   "
                     f"{r.scoring:.3f}\n")
    return results


def write_top(receptor_pdb, ligand_pdb, ranked: Sequence[RankedPose],
              output_dir, nmodes: Optional[np.ndarray], use_anm: bool,
              anm_rec: int, anm_lig: int, top_n: int = 10) -> List[pathlib.Path]:
    """Write merged receptor+ligand PDBs for the best ``top_n`` poses."""
    from .utils.pdb import parse_pdb

    lig = parse_pdb(ligand_pdb)
    rec = parse_pdb(receptor_pdb)
    outdir = pathlib.Path(output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    modes = (nmodes if nmodes is not None
             else np.zeros((0, lig.num_atoms, 3)))
    written = []
    for i, r in enumerate(ranked[:top_n], start=1):
        coords = transform_ligand_batch(
            lig.coordinates, modes, r.pose[None], use_anm, anm_rec, anm_lig)[0]
        path = outdir / f"top_{i}.pdb"
        with open(path, "w") as fh:
            n = rewrite_pdb_coords(receptor_pdb, rec.coordinates, fh)
            rewrite_pdb_coords(ligand_pdb, coords, fh, serial_offset=n)
            fh.write("END\n")
        written.append(path)
    return written
