"""Setup-stage utilities.

    lightdock-tpu-tools flatten lightdock_rec.nm.npy rec_nm.npy

``flatten`` converts the ProDy-derived (n_modes, n_atoms, 3) ANM tensor to
the flat 1-D layout the engine (and the reference binary) read — the
native equivalent of the external lgd_flatten.py step (reference
example/1czy/execution.sh:10-12).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="lightdock-tpu-tools")
    sub = ap.add_subparsers(dest="command", required=True)
    fl = sub.add_parser("flatten", help="flatten an ANM .npy to 1-D")
    fl.add_argument("src")
    fl.add_argument("dst")
    return ap


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.command == "flatten":
        data = np.load(args.src)
        np.save(args.dst, np.ascontiguousarray(data, dtype=np.float64).reshape(-1))
        print(f"{args.src} {data.shape} -> {args.dst} ({data.size},)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
