#!/usr/bin/env python3
"""One-command full DFIRE verification against the real DCparams table.

The real 169*169*20-entry DFIRE table (``DCparams``) is not redistributed
with this repo or present in the build environment; a deterministic
synthetic stand-in (scoring/potentials.synthetic_potential) keeps every
code path exercised with identical speed and semantics but different
absolute scores.  The day a real table is available, point
``LIGHTDOCK_DATA`` at its directory and run this script — it performs the
two checks the reference itself pins DFIRE with:

1. the 2oob identity-pose anchor, 16.7540569503498 exactly
   (reference src/dfire.rs:415, asserted to 1e-8), and
2. a byte-identical diff of the 1ppe end-to-end trajectory (f64 device
   engine, seed 324324) against the reference's shipped goldens
   example/1ppe/swarm_0/gso_{1,10}.out (reference README.md:66-74).

Usage:
    LIGHTDOCK_DATA=/path/to/dir-with-DCparams python scripts/verify_real_table.py

Exit status 0 iff both checks pass.  The equivalent skip-gated pytest
coverage (tests/test_energy.py::test_dfire_2oob_typing_and_energy_shape,
tests/test_engine_golden.py::test_1ppe_golden_trajectory_dfire) activates
automatically under the same env var; this script is the documented
one-shot entry point.
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ANCHOR_2OOB = 16.7540569503498
REFERENCE = pathlib.Path(os.environ.get("LIGHTDOCK_REFERENCE",
                                        "/root/reference"))


def main() -> int:
    from lightdock_tpu.scoring.potentials import dfire_data_path

    path = dfire_data_path()
    if not path.exists():
        print(f"DCparams not found at {path} — set LIGHTDOCK_DATA to the "
              "directory holding the real table.", file=sys.stderr)
        return 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lightdock_tpu.engine.energy_host import HostScorer
    from lightdock_tpu.engine.gso_jax import GsoJaxRunner
    from lightdock_tpu.scoring.models import build_model
    from lightdock_tpu.simulation import load_simulation
    from lightdock_tpu.utils.pdb import parse_pdb

    ok = True

    # -- check 1: 2oob identity-pose anchor (reference src/dfire.rs:382-416)
    rec = build_model(parse_pdb(REFERENCE / "tests/2oob/2oob_receptor.pdb"),
                      "dfire")
    lig = build_model(parse_pdb(REFERENCE / "tests/2oob/2oob_ligand.pdb"),
                      "dfire")
    energy = HostScorer("dfire", rec, lig, use_anm=False).energy(
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0])
    delta = abs(energy - ANCHOR_2OOB)
    if delta < 1e-8:
        print(f"[1/2] 2oob anchor OK: {energy!r} (|delta| = {delta:.2e})")
    else:
        ok = False
        print(f"[1/2] 2oob anchor FAILED: got {energy!r}, "
              f"want {ANCHOR_2OOB!r} (|delta| = {delta:.2e})")

    # -- check 2: 1ppe golden trajectory, byte-identical gso_1/gso_10
    ex = REFERENCE / "example/1ppe"
    sim = load_simulation(ex / "setup.json", ex / "initial_positions_0.dat",
                          "dfire", anm_dir=ex)
    with tempfile.TemporaryDirectory() as tmp:
        runner = GsoJaxRunner(sim.batch_params(), sim.positions, sim.seed,
                              sim.use_anm, sim.setup.anm_rec,
                              sim.setup.anm_lig, output_directory=tmp,
                              dtype=jnp.float64, energy_chunk=25)
        runner.run_segmented(10, 10)
        for step in (1, 10):
            got = (pathlib.Path(tmp) / f"gso_{step}.out").read_text()
            want = (ex / f"swarm_0/gso_{step}.out").read_text()
            if got == want:
                print(f"[2/2] 1ppe gso_{step}.out byte-identical")
            else:
                ok = False
                diff = next((i for i, (a, b) in enumerate(
                    zip(got.splitlines(), want.splitlines())) if a != b), -1)
                print(f"[2/2] 1ppe gso_{step}.out DIFFERS "
                      f"(first differing line: {diff})")

    print("real-table verification:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
