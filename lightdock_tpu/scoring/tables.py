"""Parameter-table loading for the scoring functions.

The JSON assets under ``data/`` hold the DFIRE residue/atom-type coding
tables and the AMBER force-field tables (extracted from the reference's
embedded literals by scripts/extract_params.py; see that script for
provenance: reference src/dfire.rs:18-101, src/dna.rs:64-233,
src/pydock.rs:66-233).
"""

from __future__ import annotations

import functools
import json
import pathlib

import numpy as np

DATA_DIR = pathlib.Path(__file__).resolve().parent / "data"


@functools.lru_cache(maxsize=None)
def dfire_tables() -> dict:
    t = json.loads((DATA_DIR / "dfire_tables.json").read_text())
    t["residue_index"] = {k: int(v) for k, v in t["residue_index"].items()}
    t["atom_slot"] = {k: int(v) for k, v in t["atom_slot"].items()}
    t["atomres"] = [list(map(int, row)) for row in t["atomres"]]
    t["dist_to_bins"] = np.asarray(t["dist_to_bins"], dtype=np.int64)
    return t


@functools.lru_cache(maxsize=None)
def amber_tables(method: str) -> dict:
    """AMBER tables for 'dna' or 'pydock' (pydock adds *-element wildcards)."""
    assert method in ("dna", "pydock")
    return json.loads((DATA_DIR / f"{method}_tables.json").read_text())
