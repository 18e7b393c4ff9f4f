"""RNG stream parity with rand 0.7 StdRng (ChaCha20)."""

import math

import numpy as np
import pytest

from lightdock_tpu.utils.rng import ReferenceRng, uniform_f64_stream

pytestmark = pytest.mark.quick


def test_seeded_quaternion_matches_reference():
    """The reference's own seeded-random expectation (src/qt.rs:451-463):
    Quaternion::random consumes three gen::<f64>() draws."""
    rng = ReferenceRng(324324324)
    u1, u2, u3 = rng.gen(3)
    q = (
        math.sqrt(1 - u1) * math.sin(2 * math.pi * u2),
        math.sqrt(1 - u1) * math.cos(2 * math.pi * u2),
        math.sqrt(u1) * math.sin(2 * math.pi * u3),
        math.sqrt(u1) * math.cos(2 * math.pi * u3),
    )
    expected = (0.31924330894562036, -0.5980633213833059,
                0.5444724265858514, 0.49391674399349367)
    # Equality up to libm sin/cos rounding; the raw draws are bit-exact.
    assert all(abs(a - b) < 1e-15 for a, b in zip(q, expected))


def test_stream_matches_incremental():
    stream = uniform_f64_stream(324324, 1000)
    rng = ReferenceRng(324324)
    parts = [rng.gen(1)[0] for _ in range(7)]
    parts.extend(rng.gen(993))
    assert np.array_equal(stream, np.asarray(parts))


def test_range_and_determinism():
    s1 = uniform_f64_stream(1, 10000)
    s2 = uniform_f64_stream(1, 10000)
    assert np.array_equal(s1, s2)
    assert (s1 >= 0).all() and (s1 < 1).all()
    assert abs(s1.mean() - 0.5) < 0.02
    assert not np.array_equal(s1, uniform_f64_stream(2, 10000))
