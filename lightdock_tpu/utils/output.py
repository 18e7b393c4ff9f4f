"""gso_N.out snapshot writer, byte-compatible with the reference.

Format (reference src/swarm.rs:128-167): a header line, then per glowworm
the pose tuple at 7 decimals, the literal ``    0    0   `` column pair,
luciferin at 8 decimals, neighbor count, vision range at 3 decimals and
scoring at 8 decimals.  Verified against the shipped goldens
(e.g. reference example/1azp/swarm_0/gso_1.out).

These snapshots double as checkpoints: ``read_gso_output`` parses one back
into arrays for the resume path (which the reference lacks).
"""

from __future__ import annotations

import pathlib
import re

import numpy as np

from . import native

HEADER = "#Coordinates  RecID  LigID  Luciferin  Neighbor's number  Vision Range  Scoring"


def format_gso_output(poses, luciferin, num_neighbors, vision, scoring) -> str:
    """Render the file body as a string (pure-Python path)."""
    lines = [HEADER]
    for g in range(poses.shape[0]):
        tup = ", ".join(f"{v:.7f}" for v in poses[g])
        lines.append(
            f"({tup})    0    0   {luciferin[g]:.8f}  "
            f"{int(num_neighbors[g])} {vision[g]:.3f} {scoring[g]:.8f}"
        )
    return "\n".join(lines) + "\n"


def write_gso_output(path, poses, luciferin, num_neighbors, vision, scoring) -> None:
    """Write one snapshot; uses the native writer when available."""
    poses = np.asarray(poses, dtype=np.float64)
    if native.write_gso(str(path), poses, luciferin, num_neighbors, vision, scoring):
        return
    pathlib.Path(path).write_text(
        format_gso_output(poses, luciferin, num_neighbors, vision, scoring))


def sidecar_path(out_path) -> pathlib.Path:
    """Full-precision checkpoint sidecar next to a gso_N.out file."""
    p = pathlib.Path(out_path)
    return p.with_suffix(p.suffix + ".npz")


def write_state_sidecar(out_path, step: int, **arrays) -> None:
    """Write the full-precision swarm state next to the text snapshot.

    The text file quantizes to 7/8 decimals (the reference's format,
    src/swarm.rs:136-164) which perturbs a resumed trajectory; the sidecar
    keeps the exact device bits so resume is bit-identical.  The text file
    stays the compatibility artifact.
    """
    np.savez(sidecar_path(out_path), step=np.int64(step),
             **{k: np.asarray(v) for k, v in arrays.items()})


def read_state_sidecar(path):
    """Load a sidecar (accepts the .out path or the .npz path).

    Returns (step, dict of arrays) or None when no sidecar exists.
    """
    p = pathlib.Path(path)
    if p.suffix != ".npz":
        p = sidecar_path(p)
    if not p.exists():
        return None
    with np.load(p) as z:
        data = {k: z[k] for k in z.files if k != "step"}
        return int(z["step"]), data


_LINE_RE = re.compile(r"\(([^)]*)\)\s+0\s+0\s+(\S+)\s+(\d+)\s+(\S+)\s+(\S+)")


def read_gso_output(path):
    """Parse a gso_N.out file back into arrays.

    Returns (poses (G, D), luciferin (G,), num_neighbors (G,), vision (G,),
    scoring (G,)).
    """
    poses, luc, nn, vis, sco = [], [], [], [], []
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        m = _LINE_RE.match(line)
        if not m:
            raise ValueError(f"unparseable gso line: {line!r}")
        poses.append([float(v) for v in m.group(1).split(",")])
        luc.append(float(m.group(2)))
        nn.append(int(m.group(3)))
        vis.append(float(m.group(4)))
        sco.append(float(m.group(5)))
    return (
        np.asarray(poses, dtype=np.float64),
        np.asarray(luc, dtype=np.float64),
        np.asarray(nn, dtype=np.int64),
        np.asarray(vis, dtype=np.float64),
        np.asarray(sco, dtype=np.float64),
    )
