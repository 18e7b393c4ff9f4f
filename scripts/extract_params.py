#!/usr/bin/env python3
"""Extract the physical parameter tables from the reference Rust sources.

The reference (LightDock-Rust, mounted read-only at /root/reference) embeds a
number of *data* tables in its source code: DFIRE residue/atom-type coding
tables (reference src/dfire.rs:18-101), AMBER force-field van-der-Waals
well-depths/radii, AMBER atom types and RESP partial charges
(src/dna.rs:64-233, src/pydock.rs with generic-element wildcards).

These are public physical constants (AMBER94 force field, DFIRE statistical
potential binning) — not program logic.  This script parses them out of the
Rust literals and writes them as JSON assets under
lightdock_tpu/scoring/data/, which is what the TPU framework loads at model
build time.  Keeping the extraction scripted (instead of hand-transcribing
>2000 numeric entries) documents provenance and eliminates transcription
errors.

Run:  python scripts/extract_params.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

HERE = pathlib.Path(__file__).resolve().parent
DATA_DIR = HERE.parent / "lightdock_tpu" / "scoring" / "data"


def _read(path: pathlib.Path) -> str:
    return path.read_text()


def parse_hashmap(src: str, name: str) -> dict:
    """Parse a `static ref NAME: HashMap<...> = hashmap![ ... ];` block."""
    m = re.search(
        r"static ref " + re.escape(name) + r"\s*:\s*HashMap<[^=]*=\s*hashmap!\[(.*?)\];",
        src,
        re.S,
    )
    if not m:
        raise ValueError(f"table {name} not found")
    body = m.group(1)
    out = {}
    # entries look like:  "KEY" => VALUE  where VALUE is "str" or a float literal
    for k, v in re.findall(r'"((?:[^"\\]|\\.)*)"\s*=>\s*("(?:[^"\\]|\\.)*"|[-+0-9eE.]+)', body):
        if v.startswith('"'):
            out[k] = v[1:-1]
        else:
            out[k] = float(v)
    return out


def parse_match_usize(src: str, fn_name: str) -> dict:
    """Parse `pub fn NAME(...) -> usize { match ... { "K" => N, ... } }`."""
    m = re.search(r"pub fn " + re.escape(fn_name) + r"\b.*?\{\s*match.*?\{(.*?)\n\}", src, re.S)
    if not m:
        raise ValueError(f"fn {fn_name} not found")
    body = m.group(1)
    return {k: int(v) for k, v in re.findall(r'"([A-Z0-9]+)"\s*=>\s*(\d+)', body)}


def parse_dist_to_bins(src: str) -> list:
    m = re.search(r"const DIST_TO_BINS:\s*&\[usize\]\s*=\s*&\[(.*?)\];", src, re.S)
    if not m:
        raise ValueError("DIST_TO_BINS not found")
    return [int(x) for x in re.findall(r"\d+", m.group(1))]


def parse_atomres(src: str) -> list:
    m = re.search(r"static ref ATOMRES:\s*Vec<Vec<usize>>\s*=\s*vec!\[(.*?)\];", src, re.S)
    if not m:
        raise ValueError("ATOMRES not found")
    rows = []
    for row in re.findall(r"vec!\[(.*?)\]", m.group(1)):
        rows.append([int(x) for x in re.findall(r"\d+", row)])
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    ref = pathlib.Path(args.reference)

    DATA_DIR.mkdir(parents=True, exist_ok=True)

    dfire_src = _read(ref / "src" / "dfire.rs")
    dfire = {
        "residue_index": parse_match_usize(dfire_src, "r3_to_numerical"),
        "dist_to_bins": parse_dist_to_bins(dfire_src),
        "atom_slot": parse_hashmap(dfire_src, "ATOMNUMBER"),
        "atomres": parse_atomres(dfire_src),
    }
    assert len(dfire["dist_to_bins"]) == 51
    assert len(dfire["atomres"]) == 22 and all(len(r) == 14 for r in dfire["atomres"])
    (DATA_DIR / "dfire_tables.json").write_text(json.dumps(dfire, indent=1, sort_keys=True))
    print(f"dfire_tables.json: {len(dfire['atom_slot'])} atom slots, "
          f"{len(dfire['residue_index'])} residues")

    for which, fname in (("dna", "dna.rs"), ("pydock", "pydock.rs")):
        src = _read(ref / "src" / fname)
        tables = {
            "vdw_charges": parse_hashmap(src, "VDW_CHARGES"),
            "vdw_radii": parse_hashmap(src, "VDW_RADII"),
            "amber_types": parse_hashmap(src, "AMBER_TYPES"),
            "ele_charges": parse_hashmap(src, "ELE_CHARGES"),
            "nt_ele_charges": parse_hashmap(src, "NT_ELE_CHARGES"),
        }
        (DATA_DIR / f"{which}_tables.json").write_text(
            json.dumps(tables, indent=1, sort_keys=True))
        print(f"{which}_tables.json: " + ", ".join(
            f"{k}={len(v)}" for k, v in tables.items()))

    # Sanity: pydock tables must be a superset of dna tables (wildcards added).
    dna = json.loads((DATA_DIR / "dna_tables.json").read_text())
    pyd = json.loads((DATA_DIR / "pydock_tables.json").read_text())
    for key in dna:
        extra = set(pyd[key]) - set(dna[key])
        missing = set(dna[key]) - set(pyd[key])
        diffs = {k for k in dna[key] if k in pyd[key] and dna[key][k] != pyd[key][k]}
        print(f"  {key}: pydock adds {sorted(extra) if extra else '{}'}"
              + (f" MISSING {missing}" if missing else "")
              + (f" DIFFERS {diffs}" if diffs else ""))


if __name__ == "__main__":
    main()
