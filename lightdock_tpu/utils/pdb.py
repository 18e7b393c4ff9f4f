"""Minimal PDB structure reader.

Produces the flat atom stream the scoring-model builders consume.  Atom
order is file order (ATOM/HETATM records), which matches the reference's
chains -> residues -> atoms flattening of pdbtbx structures (reference
src/dfire.rs:132-186) for the sorted single-model files that the LightDock
setup tooling emits.

Restraint residue identifiers are built exactly like the reference:
``"{chain}.{resname}.{serial}{icode?}"`` (reference src/dfire.rs:139-142),
including the insertion-code suffix exercised by the ab_icode example.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import List

from . import native


@dataclasses.dataclass
class Structure:
    """Columnar atom table for one parsed structure."""

    atom_names: List[str]
    res_names: List[str]
    res_ids: List[str]       # "{chain}.{resname}.{serial}{icode?}" per atom
    chain_ids: List[str]
    coordinates: "np.ndarray"  # (N, 3) float64

    @property
    def num_atoms(self) -> int:
        return len(self.atom_names)


def parse_pdb(path) -> Structure:
    """Parse ATOM/HETATM records of a PDB file into a Structure."""
    import numpy as np

    native_result = native.parse_pdb(str(path))
    if native_result is not None:
        return Structure(*native_result)

    atom_names: List[str] = []
    res_names: List[str] = []
    res_ids: List[str] = []
    chain_ids: List[str] = []
    coords: List[tuple] = []

    text = pathlib.Path(path).read_text()
    for line in text.splitlines():
        rec = line[:6]
        if rec != "ATOM  " and rec != "HETATM":
            continue
        atom_name = line[12:16].strip()
        res_name = line[17:20].strip()
        chain_id = line[21].strip()
        res_serial = line[22:26].strip()
        icode = line[26].strip()
        x = float(line[30:38])
        y = float(line[38:46])
        z = float(line[46:54])
        res_id = f"{chain_id}.{res_name}.{res_serial}{icode}"
        atom_names.append(atom_name)
        res_names.append(res_name)
        res_ids.append(res_id)
        chain_ids.append(chain_id)
        coords.append((x, y, z))

    return Structure(
        atom_names=atom_names,
        res_names=res_names,
        res_ids=res_ids,
        chain_ids=chain_ids,
        coordinates=np.asarray(coords, dtype=np.float64).reshape(-1, 3),
    )
