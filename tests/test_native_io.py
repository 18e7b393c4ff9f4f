"""Native (C++) IO runtime parity with the pure-Python implementations."""

import pathlib

import numpy as np
import pytest

from lightdock_tpu.utils import native
from lightdock_tpu.utils.output import read_gso_output


@pytest.fixture(scope="module")
def native_lib():
    lib = native._load()
    if lib is None:
        pytest.skip("native IO library unavailable (no g++?)")
    return lib


def test_native_pdb_parse_matches_python(reference_dir, native_lib):
    path = reference_dir / "tests/1azp/1azp_receptor.pdb"
    res = native.parse_pdb(str(path))
    assert res is not None
    an, rn, ri, ci, co = res

    # Pure-Python reference parse (bypass the native fast path).
    saved = native._lib
    try:
        native._lib = None
        from lightdock_tpu.utils.pdb import parse_pdb
        s = parse_pdb(path)
    finally:
        native._lib = saved

    assert an == s.atom_names
    assert rn == s.res_names
    assert ri == s.res_ids
    assert ci == s.chain_ids
    assert np.array_equal(co, s.coordinates)


def test_native_writer_byte_identical_to_golden(reference_dir, native_lib, tmp_path):
    golden = reference_dir / "example/1azp/swarm_0/gso_1.out"
    poses, luc, nn, vis, sco = read_gso_output(golden)
    out = tmp_path / "gso_1.out"
    assert native.write_gso(str(out), poses, luc, nn, vis, sco)
    assert out.read_text() == golden.read_text()


def test_native_writer_no_anm(reference_dir, native_lib, tmp_path):
    golden = reference_dir / "example/1ppe/swarm_0/gso_100.out"
    poses, luc, nn, vis, sco = read_gso_output(golden)
    out = tmp_path / "gso_100.out"
    assert native.write_gso(str(out), poses, luc, nn, vis, sco)
    assert out.read_text() == golden.read_text()
