"""Host-side (NumPy, float64) scoring oracle.

Single-pose energies with the exact semantics of the reference scoring
functions (DFIRE reference src/dfire.rs:264-362; DNA src/dna.rs:410-529;
PYDOCK src/pydock.rs:426-543 — PYDOCK's energy body is byte-identical to
DNA's, they differ only in model building).  This module is the ground
truth the batched device engine is tested against, and also powers the
sequential "parity" engine used for golden-file reproduction.

Vectorised over atom pairs but evaluated one pose at a time; the math is
IEEE f64 throughout.  Summation uses NumPy pairwise reduction, which
differs from the reference's sequential accumulation only at the last few
ulps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .. import constants as C
from ..ops import quaternion as qt
from ..scoring import potentials, tables
from ..scoring.models import DockingModel


def pose_transform(model: DockingModel, anm_coefs: np.ndarray,
                   translation=None, rotation=None) -> np.ndarray:
    """Apply the reference pose transform to one structure's coordinates.

    Ligand: rotate by quaternion, then translate, then add the ANM
    displacement sum; receptor: ANM only (reference src/dfire.rs:274-320).
    ``translation``/``rotation`` of None means receptor mode.
    """
    coords = model.coordinates
    if rotation is not None:
        coords = qt.rotate(np.asarray(rotation, dtype=np.float64), coords)
        coords = coords + np.asarray(translation, dtype=np.float64)
    if model.num_anm > 0 and anm_coefs is not None and len(anm_coefs) > 0:
        # nmodes: (K, N, 3); coefs: (K,)
        coords = coords + np.tensordot(np.asarray(anm_coefs, dtype=np.float64),
                                       model.nmodes, axes=(0, 0))
    return coords


def satisfied_restraints(interface: np.ndarray, restraints: dict) -> float:
    """Fraction of restraint residues with >=1 interface atom
    (reference src/scoring.rs:21-36)."""
    if not restraints:
        return 0.0
    hit = 0
    for atom_idx in restraints.values():
        if interface[np.asarray(atom_idx, dtype=np.int64)].any():
            hit += 1
    return hit / len(restraints)


def membrane_intersection(interface: np.ndarray, membrane: np.ndarray) -> float:
    """Fraction of membrane beads in the interface (reference
    src/scoring.rs:38-47)."""
    if membrane.size == 0:
        return 0.0
    return float(interface[membrane].sum()) / membrane.size


def _bias(score: float, rec_model: DockingModel, lig_model: DockingModel,
          iface_rec: np.ndarray, iface_lig: np.ndarray) -> float:
    perc_rec = satisfied_restraints(iface_rec, rec_model.active_restraints)
    perc_lig = satisfied_restraints(iface_lig, lig_model.active_restraints)
    penalty = 0.0
    intersection = membrane_intersection(iface_rec, rec_model.membrane)
    if intersection > 0.0:
        penalty = C.MEMBRANE_PENALTY_SCORE * intersection
    return score + perc_rec * score + perc_lig * score - penalty


@dataclasses.dataclass
class HostScorer:
    """Bundles two docking models + method parameters; callable oracle."""

    method: str
    receptor: DockingModel
    ligand: DockingModel
    use_anm: bool
    potential: Optional[np.ndarray] = None   # DFIRE flat table
    dist_to_bins: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.method == "dfire":
            if self.potential is None:
                self.potential = potentials.load_potential()
            if self.dist_to_bins is None:
                self.dist_to_bins = tables.dfire_tables()["dist_to_bins"]

    def transformed_coordinates(self, translation, rotation, rec_nmodes, lig_nmodes):
        rec = pose_transform(self.receptor, rec_nmodes if self.use_anm else None)
        lig = pose_transform(self.ligand, lig_nmodes if self.use_anm else None,
                             translation, rotation)
        return rec, lig

    def energy(self, translation, rotation, rec_nmodes=None, lig_nmodes=None) -> float:
        rec, lig = self.transformed_coordinates(translation, rotation, rec_nmodes, lig_nmodes)
        if self.method == "dfire":
            return self._dfire(rec, lig)
        return self._elec_vdw(rec, lig)

    # -- DFIRE -------------------------------------------------------------
    def _dfire(self, rec: np.ndarray, lig: np.ndarray) -> float:
        diff = rec[:, None, :] - lig[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", diff, diff)
        mask = d2 <= C.DFIRE_DIST_CUTOFF2
        d = np.sqrt(d2, where=mask, out=np.zeros_like(d2)) * 2.0 - 1.0
        # Rust `d as usize`: truncation toward zero with negative saturation
        # to 0 (reference src/dfire.rs:337).
        slot = np.clip(np.trunc(d), 0, len(self.dist_to_bins) - 1).astype(np.int64)
        bins = self.dist_to_bins[slot] - 1
        idx = (self.receptor.atom_types[:, None].astype(np.int64)
               * (C.DFIRE_NUM_ATOM_TYPES * C.DFIRE_NUM_BINS)
               + self.ligand.atom_types[None, :].astype(np.int64) * C.DFIRE_NUM_BINS
               + bins)
        contrib = self.potential[idx]
        score = contrib[mask].sum()
        score = (score * C.DFIRE_SCALE - C.DFIRE_OFFSET) * -1.0
        # Interface on the *scaled* distance d (reference src/dfire.rs:339).
        close = mask & (d <= C.INTERFACE_CUTOFF)
        iface_rec = close.any(axis=1)
        iface_lig = close.any(axis=0)
        return _bias(score, self.receptor, self.ligand, iface_rec, iface_lig)

    # -- DNA / PYDOCK ------------------------------------------------------
    def _elec_vdw(self, rec: np.ndarray, lig: np.ndarray) -> float:
        diff = rec[:, None, :] - lig[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", diff, diff)

        elec_mask = d2 <= C.ELEC_DIST_CUTOFF2
        with np.errstate(divide="ignore", invalid="ignore"):
            elec = (self.receptor.ele_charges[:, None]
                    * self.ligand.ele_charges[None, :]) / d2
        elec = np.clip(elec, C.ELEC_MIN_CUTOFF, C.ELEC_MAX_CUTOFF)
        total_elec = elec[elec_mask].sum()

        vdw_mask = d2 <= C.VDW_DIST_CUTOFF2
        vdw_energy = np.sqrt(self.receptor.vdw_charges[:, None]
                             * self.ligand.vdw_charges[None, :])
        vdw_radius = self.receptor.vdw_radii[:, None] + self.ligand.vdw_radii[None, :]
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            p6 = vdw_radius ** 6 / d2 ** 3
            k = vdw_energy * (p6 * p6 - 2.0 * p6)
        k = np.minimum(k, C.VDW_CUTOFF)
        total_vdw = k[vdw_mask].sum()

        total_elec = total_elec * C.FACTOR / C.EPSILON
        score = (total_elec + total_vdw) * -1.0

        close = d2 <= C.INTERFACE_CUTOFF2
        iface_rec = close.any(axis=1)
        iface_lig = close.any(axis=0)
        return _bias(score, self.receptor, self.ligand, iface_rec, iface_lig)
