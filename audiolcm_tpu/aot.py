"""Persisted compiled executables (AOT serving cache).

jax's persistent compilation cache removes recompiles, but a warm process
still pays a full trace + lowering of the pipeline graph — minutes on small
hosts for the production generate program. Serializing the compiled PjRt
executable (jax.experimental.serialize_executable) skips tracing, lowering
AND compilation: a warm bench/serving process loads the binary and runs.

Artifacts are keyed by a fingerprint of the package sources, the caller's
config knobs, the jax version and the device kind, so any code/config/device
change invalidates cleanly and falls back to a normal compile (which then
re-persists).

The reference has no analogue (its Lightning/torch stack rebuilds eagerly
every run); this is a TPU-native serving win — XLA programs are static and
therefore fully bakeable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Sequence, Tuple

import jax

_SKIP_DIRS = {"__pycache__"}


def source_fingerprint(extra: Sequence[Any] = ()) -> str:
    """Hash of every .py under audiolcm_tpu + jax version + device kind +
    caller-supplied config values."""
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames[:] = sorted(d for d in dirnames if d not in _SKIP_DIRS)
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), root)
                h.update(rel.encode())
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(f.read())
    for e in extra:
        h.update(repr(e).encode())
    h.update(jax.__version__.encode())
    try:
        d = jax.devices()[0]
        h.update(f"{d.platform}/{getattr(d, 'device_kind', '')}".encode())
    except Exception:
        pass
    h.update(runtime_build_id().encode())
    return h.hexdigest()[:16]


def runtime_build_id() -> str:
    """Identity of the TPU runtime/libtpu build the executable was compiled
    against. This environment rolls libtpu mid-flight (MULTICHIP_r01's
    failure tail was literally a client/AOT libtpu version mismatch), and a
    stale serialized executable can deserialize fine yet raise
    FAILED_PRECONDITION at execution — so the build string (which carries
    the SerializedExecutable/compile-cache versions and the build CL) must
    be part of every artifact key. Overridable for tests via
    AUDIOLCM_AOT_BUILD_ID."""
    forced = os.environ.get("AUDIOLCM_AOT_BUILD_ID")
    if forced is not None:
        return forced
    try:
        from jax._src import xla_bridge

        return str(getattr(xla_bridge.get_backend(), "platform_version", ""))
    except Exception:
        return ""


def cache_dir() -> str:
    return os.environ.get(
        "AUDIOLCM_AOT_CACHE",
        os.path.join(
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"), "aot"
        ),
    )


def purge(tag: str) -> int:
    """Drop every persisted artifact for `tag`; returns the number removed.

    Callers use this when a LOADED executable fails at call time (stale
    libtpu despite the build-id key, corrupted artifact, flag-default
    drift): purge + a fresh load_or_compile gives a clean recompile."""
    n = 0
    d = cache_dir()
    if not os.path.isdir(d):
        return 0
    for fn in os.listdir(d):
        if fn.startswith(f"{tag}-") and fn.endswith(".pkl"):
            try:
                os.remove(os.path.join(d, fn))
                n += 1
            except OSError:
                pass
    return n


def load_or_compile(
    tag: str, jit_fn, args: tuple, *, extra: Sequence[Any] = ()
) -> Tuple[Any, str]:
    """Return (callable, "loaded"|"compiled").

    The callable takes only the DYNAMIC args of jit_fn (static_argnums values
    are baked into the executable at lower time). On a cache miss the function
    is lowered+compiled normally and the executable persisted for next time;
    persistence failures (e.g. a backend without executable serialization)
    degrade to plain compile silently.

    "loaded" executables can still fail AT CALL TIME if the runtime moved
    underneath the key (see runtime_build_id): callers running unattended
    (bench.py, serving loops) should wrap the first invocation, and on
    failure `purge(tag)` + call load_or_compile again for a clean compile.
    """
    from jax.experimental import serialize_executable as se

    key = source_fingerprint(extra)
    path = os.path.join(cache_dir(), f"{tag}-{key}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                ser, in_tree, out_tree, n_exec_devices = pickle.load(f)
            # pin the execution devices the executable was built for (without
            # this, loading in a multi-device process assumes all devices)
            loaded = se.deserialize_and_load(
                ser, in_tree, out_tree,
                execution_devices=jax.devices()[:n_exec_devices],
            )
            return loaded, "loaded"
        except Exception:
            pass  # stale/incompatible artifact — recompile below

    compiled = jit_fn.lower(*args).compile()
    try:
        n_exec_devices = len(compiled._executable.xla_executable.local_devices())
    except Exception:
        n_exec_devices = 1
    try:
        ser, in_tree, out_tree = se.serialize(compiled)
        payload = pickle.dumps((ser, in_tree, out_tree, n_exec_devices))
        os.makedirs(cache_dir(), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        # each artifact is >500MB for the production pipeline and any source
        # edit re-keys it: drop superseded artifacts for the same tag
        for fn in os.listdir(cache_dir()):
            if (fn.startswith(f"{tag}-") and fn.endswith(".pkl")
                    and fn != os.path.basename(path)):
                try:
                    os.remove(os.path.join(cache_dir(), fn))
                except OSError:
                    pass
    except Exception:
        pass
    return compiled, "compiled"
