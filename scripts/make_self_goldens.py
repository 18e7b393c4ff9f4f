#!/usr/bin/env python3
"""Generate committed self-goldens for DFIRE end-to-end trajectories.

The environment lacks the real DFIRE table (data/DCparams), so the
reference's shipped 1ppe goldens cannot be reproduced here; instead we pin
DFIRE end-to-end behavior against the deterministic synthetic table
(scoring/potentials.synthetic_potential, seeded) with goldens produced ONCE
by the float64 host parity engine and committed:

  tests/goldens/1ppe_synth/gso_{1,10}.out   DFIRE, no ANM
  tests/goldens/2uuy_synth/gso_{1,10}.out   DFIRE, ANM 10+10

tests/test_engine_golden.py then asserts byte-identity from BOTH engines
(device f64 + host), mirroring the discipline of the reference's shipped
1azp/1ppe goldens (reference example/1ppe/swarm_0/gso_1.out).
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, "/root/repo")

from lightdock_tpu.engine.gso_host import GsoHostEngine
from lightdock_tpu.simulation import load_simulation
from lightdock_tpu.utils.output import format_gso_output

REF = pathlib.Path("/root/reference/example")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests/goldens"


def generate(example: str, name: str, steps=(1, 10)):
    ex = REF / example
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire", anm_dir=ex)
    engine = GsoHostEngine(sim.batch_params(), sim.positions, sim.seed,
                           sim.use_anm, sim.setup.anm_rec, sim.setup.anm_lig)
    outdir = OUT / name
    outdir.mkdir(parents=True, exist_ok=True)

    def snap(e, step):
        if step in steps:
            (outdir / f"gso_{step}.out").write_text(format_gso_output(
                e.poses(), e.luciferin, e.num_neighbors, e.vision, e.scoring))
            print(f"wrote {outdir}/gso_{step}.out", flush=True)

    engine.run(max(steps), on_step=snap)


if __name__ == "__main__":
    generate("1ppe", "1ppe_synth")
    generate("2uuy", "2uuy_synth")
