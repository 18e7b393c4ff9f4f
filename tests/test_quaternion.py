"""Quaternion algebra parity (values from reference src/qt.rs:200-464)."""

import numpy as np
import pytest

from lightdock_tpu.ops import quaternion as qt

pytestmark = pytest.mark.quick


def q(w, x, y, z):
    return np.array([w, x, y, z], dtype=np.float64)


def test_mul():
    a = q(1.0, 0.0, 0.0, 2.0)
    b = q(3.0, -1.0, 4.0, 3.0)
    assert np.allclose(qt.qmul(a, b), q(-3.0, -9.0, 2.0, 9.0), atol=0)
    assert np.allclose(qt.qmul(b, a), q(-3.0, 7.0, 6.0, 9.0), atol=0)
    c = q(0.5, -3.0, 2.0, 9.0)
    assert np.allclose(qt.qmul(qt.qmul(b, a), c),
                       q(-147.0 / 2.0, 97.0 / 2.0, -93.0, 19.0 / 2.0), atol=0)


def test_conjugate_inverse():
    a = q(1.0, 0.0, 0.0, 2.0)
    b = q(3.0, -1.0, 4.0, 3.0)
    ab = qt.qmul(a, b)
    assert np.allclose(qt.qconj(ab), qt.qmul(qt.qconj(b), qt.qconj(a)), atol=0)
    inv = qt.qinverse(ab)
    expected = q(-3.0 / 175.0, 9.0 / 175.0, -2.0 / 175.0, -9.0 / 175.0)
    assert np.allclose(inv, expected, atol=1e-16)


def test_normalize():
    v = q(1.0, -3.0, 4.0, 3.0)
    expected = q(0.1690308509457033, -0.50709255283711, 0.6761234037828132, 0.50709255283711)
    assert np.allclose(qt.qnormalize(v), expected, atol=1e-15)


def test_rotation():
    rot = q(0.707106781, 0.0, 0.707106781, 0.0)
    v = np.array([1.0, 0.0, 0.0])
    out = qt.rotate(rot, v)
    assert np.allclose(out, [0.0, 0.0, -1.0], atol=1e-9)


def test_rotation_matrix_matches_hamilton():
    rng = np.random.RandomState(7)
    quats = rng.standard_normal((50, 4))
    vecs = rng.standard_normal((50, 3)) * 30
    direct = qt.rotate(quats, vecs)
    via_matrix = np.einsum("gab,gb->ga", qt.rotation_matrix(quats), vecs)
    assert np.allclose(direct, via_matrix, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "q1,q2,t,expected",
    [
        # src/qt.rs:392-400 (t=0 normalises q1)
        ((1, 0, 0, 2), (3, -1, 4, 3), 0.0,
         (0.4472135954999579, 0.0, 0.0, 0.8944271909999159)),
        # src/qt.rs:403-416
        ((1, 0, 0, 2), (3, -1, 4, 3), 1.0,
         (0.50709255283711, -0.1690308509457033, 0.6761234037828132, 0.50709255283711)),
        # src/qt.rs:429-437
        ((1, 0, 0, 0), (0, 0, 1, 0), 0.5,
         (0.7071067811865475, 0.0, 0.7071067811865475, 0.0)),
        # src/qt.rs:440-448
        ((0.7071067811865475, 0, 0, 0.7071067811865475),
         (0, 0.7071067811865475, 0.7071067811865475, 0), 0.5,
         (0.5, 0.5, 0.5, 0.5)),
    ],
)
def test_slerp_values(q1, q2, t, expected):
    out = qt.slerp(np.array(q1, dtype=float), np.array(q2, dtype=float), t)
    assert np.allclose(out, expected, atol=1e-14)


def test_slerp_same_quaternion_linear_branch():
    a = q(0.7071067811865476, 0.0, 0.0, 0.7071067811865476)
    out = qt.slerp(a, a, 0.1)
    assert np.allclose(out, a, atol=1e-15)


def test_slerp_shortest_path_flip():
    a = qt.qnormalize(q(1.0, 0.2, -0.3, 0.4))
    out = qt.slerp(a, -a, 0.5)  # dot = -1 -> flip, then linear branch
    assert np.allclose(np.abs(out), np.abs(a), atol=1e-12)


def test_slerp_batched_matches_scalar():
    rng = np.random.RandomState(3)
    q1 = rng.standard_normal((64, 4))
    q2 = rng.standard_normal((64, 4))
    batched = qt.slerp(q1, q2, 0.5)
    for i in range(64):
        single = qt.slerp(q1[i], q2[i], 0.5)
        assert np.allclose(batched[i], single, atol=0)
