"""AOT executable cache: pickle compiled XLA executables to disk.

Compile time is the dominant practical cost of this framework under the
remote-TPU plugin (BENCH_r04: 1,768 s compile for a 0.12 s measured run)
and jax's persistent compilation cache does not engage with it
(CLAUDE.md).  This is the coarser but working alternative: serialize the
whole compiled executable (``jax.experimental.serialize_executable``)
keyed by a hash of the *lowered StableHLO program* — tracing/lowering is
cheap and local; only ``.compile()`` pays the remote round-trip.  A
second process running the same program (same shapes, same config, same
jax/backend) deserializes in milliseconds instead of recompiling.

Opt-in via ``LIGHTDOCK_AOT_CACHE=<dir>`` (or an explicit ``cache_dir``).
The cache is safe to delete at any time; keys include the jax version,
backend, and device kinds, so topology changes miss cleanly.  Known
limits: executables only load on a matching device topology (a farm
compiled for an 8-device mesh will not load single-chip), and the
underlying PJRT ``SerializeExecutable`` may be unimplemented for some
plugins — both cases fall back to a normal compile, recording the reason
in ``AotDispatch.stats``.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pathlib
import pickle
import tempfile

import jax

log = logging.getLogger(__name__)


def cache_dir_from_env():
    d = os.environ.get("LIGHTDOCK_AOT_CACHE")
    return pathlib.Path(d) if d else None


def _key(lowered) -> str:
    ident = "\x00".join([
        jax.__version__,
        jax.default_backend(),
        ",".join(d.device_kind for d in jax.devices()),
        str(len(jax.devices())),
        lowered.as_text(),
    ])
    return hashlib.sha256(ident.encode()).hexdigest()[:24]


def compile_cached(lowered, cache_dir, label: str = "fn"):
    """``lowered.compile()`` with a disk round-trip.

    Returns (compiled_executable, status) where status is one of
    'hit', 'miss', 'store-failed', 'load-failed', 'off'.
    """
    from jax.experimental import serialize_executable as se

    if cache_dir is None:
        return lowered.compile(), "off"
    cache_dir = pathlib.Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = cache_dir / f"{label}-{_key(lowered)}.aotx"
    if path.exists():
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree, dev_ids = pickle.load(fh)
            # The executable must load onto exactly the devices it was
            # compiled for — resolved by recorded device id, not by
            # position (a runner pinned to devices[2:3] or a
            # jax.distributed worker would otherwise load onto the wrong
            # chips); a missing id raises -> load-failed -> recompile.
            by_id = {d.id: d for d in jax.devices()}
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in dev_ids])
            log.info("AOT cache hit: %s", path.name)
            return compiled, "hit"
        except Exception as e:  # noqa: BLE001 - any load failure -> compile
            log.warning("AOT cache load failed (%s); replacing entry", e)
            try:
                path.unlink()  # a corrupt/stale entry never repairs itself
            except OSError:
                pass
            compiled, status = compile_cached(lowered, cache_dir, label)
            return compiled, "load-failed"
    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        xe = compiled._params.executable.xla_executable
        dev_ids = [d.id for d in xe.local_devices()]
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree, dev_ids), fh)
        os.replace(tmp, path)  # atomic: concurrent processes race safely
        log.info("AOT cache store: %s (%d bytes)", path.name, len(payload))
        return compiled, "miss"
    except Exception as e:  # noqa: BLE001 - serialization unsupported
        log.warning("AOT serialize failed (%s); caching disabled for this "
                    "executable", e)
        return compiled, "store-failed"


class AotDispatch:
    """Drop-in replacement for ``jax.jit(fn)`` that AOT-caches per input
    shape signature.  With no cache dir configured it IS ``jax.jit(fn)``
    (zero overhead, identical dispatch path)."""

    def __init__(self, fn, label: str = "fn", cache_dir=None,
                 static_argnames=()):
        self._jit = jax.jit(fn, static_argnames=static_argnames)
        self._label = label
        self._dir = cache_dir if cache_dir is not None else cache_dir_from_env()
        self._compiled = {}
        self.stats = []

    def __call__(self, *args):
        if self._dir is None:
            return self._jit(*args)
        sig = tuple(
            tuple((leaf.shape, str(leaf.dtype))
                  for leaf in jax.tree_util.tree_leaves(a)
                  if hasattr(leaf, "shape"))
            for a in args)
        entry = self._compiled.get(sig)
        if entry is None:
            lowered = self._jit.lower(*args)
            entry, status = compile_cached(lowered, self._dir, self._label)
            self.stats.append(status)
            self._compiled[sig] = entry
        try:
            return entry(*args)
        except Exception as e:  # noqa: BLE001 - e.g. sharding/device
            # mismatch a cache hit could not detect at load time: fall
            # back to the plain jit path permanently for this signature.
            log.warning("AOT executable call failed (%s); falling back to "
                        "jit dispatch", e)
            self.stats.append("call-failed")
            self._compiled[sig] = self._jit
            return self._jit(*args)
