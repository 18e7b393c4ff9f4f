"""Quaternion algebra, in batched array form.

Capability parity with the reference's quaternion layer (reference
src/qt.rs:11-104): Hamilton product, conjugate/inverse, vector rotation
``q v q^-1``, and SLERP with the shortest-path dot flip and the
normalized-linear fallback above ``LINEAR_THRESHOLD`` (reference
src/qt.rs:67-91, threshold src/constants.rs:11).

Everything here operates on arrays whose last axis is the quaternion
(w, x, y, z); all functions broadcast over arbitrary leading batch axes and
are identical source for NumPy and jax.numpy (pass the module via ``xp``).
The GSO engines batch all G=200 glowworms of a swarm through these in one
call — there is no scalar quaternion object anywhere in the framework.
"""

from __future__ import annotations

import numpy as np

from ..constants import LINEAR_THRESHOLD


def qmul(a, b, xp=np):
    """Hamilton product of quaternion arrays (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return xp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qconj(q, xp=np):
    return xp.stack([q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]], axis=-1)


def qnorm2(q, xp=np):
    return (q * q).sum(axis=-1)


def qinverse(q, xp=np):
    return qconj(q, xp) / qnorm2(q, xp)[..., None]


def qnormalize(q, xp=np):
    n = xp.sqrt(qnorm2(q, xp))
    return q / n[..., None]


def qdot(a, b):
    return (a * b).sum(axis=-1)


def rotate(q, v, xp=np):
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4).

    Uses the exact double-Hamilton-product form ``q * (0, v) * q.inverse()``
    of the reference (src/qt.rs:57-61) — including the division by |q|^2 —
    so results agree with it to the last ulp for normalized and
    unnormalized quaternions alike.
    """
    zeros = xp.zeros_like(v[..., :1])
    vq = xp.concatenate([zeros, v], axis=-1)
    r = qmul(qmul(q, vq, xp), qinverse(q, xp), xp)
    return r[..., 1:]


def rotation_matrix(q, xp=np):
    """Rotation matrices (..., 3, 3) equivalent to ``rotate`` including the
    1/|q|^2 factor.  Used by the device fast path: rotating N atoms by one
    matrix is a (3,3)x(3,N) contraction instead of 2N Hamilton products."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n2 = w * w + x * x + y * y + z * z
    s = 1.0 / n2
    m = xp.stack(
        [
            xp.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            xp.stack([2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)], axis=-1),
            xp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z], axis=-1),
        ],
        axis=-2,
    )
    return m * s[..., None, None]


def slerp(q1, q2, t, xp=np):
    """Spherical linear interpolation with the reference's exact semantics
    (src/qt.rs:67-91): normalize both, flip q1 when the dot is negative,
    use normalized lerp when dot > LINEAR_THRESHOLD, else the sin-ratio
    form.  Branch-free (xp.where) so it vectorises and jits."""
    q1 = qnormalize(q1, xp)
    q2 = qnormalize(q2, xp)
    d = qdot(q1, q2)
    flip = d < 0.0
    q1 = xp.where(flip[..., None], -q1, q1)
    d = xp.where(flip, -d, d)

    # Linear branch
    lin = q1 + (q2 - q1) * t
    lin = qnormalize(lin, xp)

    # Spherical branch (clamp exactly like the reference: min then max)
    dc = xp.maximum(xp.minimum(d, 1.0), -1.0)
    omega = xp.arccos(dc)
    so = xp.sin(omega)
    # Guard the (unused) spherical values in the linear regime against 0/0.
    so_safe = xp.where(d > LINEAR_THRESHOLD, 1.0, so)
    c1 = xp.sin((1.0 - t) * omega) / so_safe
    c2 = xp.sin(t * omega) / so_safe
    sph = q1 * c1[..., None] + q2 * c2[..., None]

    return xp.where((d > LINEAR_THRESHOLD)[..., None], lin, sph)
