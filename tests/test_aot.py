"""AOT executable persistence (audiolcm_tpu/aot.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu import aot


def _jit_fn():
    def f(params, x, n):
        return {"y": params["w"] * x + n, "s": x.sum()}

    return jax.jit(f, static_argnums=(2,))


def test_load_or_compile_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDIOLCM_AOT_CACHE", str(tmp_path))
    params = {"w": jnp.full((8,), 2.0)}
    x = jnp.arange(8.0)
    args = (params, x, 5)

    f1, how1 = aot.load_or_compile("t", _jit_fn(), args, extra=("cfg", 1))
    assert how1 == "compiled"
    out1 = f1(params, x)  # dynamic args only; the static n=5 is baked in

    f2, how2 = aot.load_or_compile("t", _jit_fn(), args, extra=("cfg", 1))
    assert how2 == "loaded"
    out2 = f2(params, x)
    np.testing.assert_allclose(np.asarray(out1["y"]), np.asarray(out2["y"]))
    np.testing.assert_allclose(np.asarray(out1["y"]), np.arange(8.0) * 2.0 + 5)


def test_fingerprint_invalidates_on_config(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDIOLCM_AOT_CACHE", str(tmp_path))
    params = {"w": jnp.ones((4,))}
    x = jnp.ones((4,))
    _, how1 = aot.load_or_compile("t", _jit_fn(), (params, x, 1), extra=("a",))
    _, how2 = aot.load_or_compile("t", _jit_fn(), (params, x, 1), extra=("b",))
    assert how1 == how2 == "compiled"  # different config -> different artifact
    assert aot.source_fingerprint(("a",)) != aot.source_fingerprint(("b",))


def test_runtime_build_rekeys_and_purge_recovers(tmp_path, monkeypatch):
    """A libtpu/runtime roll must invalidate artifacts (the environment
    demonstrably rolls libtpu mid-flight: MULTICHIP_r01's failure tail), and
    a stale executable that only fails AT CALL TIME must be recoverable via
    purge() + a fresh load_or_compile — the exact path bench.py's warmup
    guard exercises."""
    monkeypatch.setenv("AUDIOLCM_AOT_CACHE", str(tmp_path))
    params = {"w": jnp.ones((4,))}
    x = jnp.ones((4,))
    args = (params, x, 0)

    monkeypatch.setenv("AUDIOLCM_AOT_BUILD_ID", "libtpu-buildA")
    assert aot.runtime_build_id() == "libtpu-buildA"
    _, how1 = aot.load_or_compile("t", _jit_fn(), args, extra=())
    assert how1 == "compiled"
    _, how2 = aot.load_or_compile("t", _jit_fn(), args, extra=())
    assert how2 == "loaded"

    # runtime build rolls -> different key -> clean recompile, never a stale
    # load of buildA's executable
    monkeypatch.setenv("AUDIOLCM_AOT_BUILD_ID", "libtpu-buildB")
    _, how3 = aot.load_or_compile("t", _jit_fn(), args, extra=())
    assert how3 == "compiled"

    # call-time-failure recovery: simulate an artifact that deserializes into
    # a callable that raises on execution (what a libtpu mismatch looks like
    # when the build-id could not be captured), then prove purge + reload
    # compiles fresh and works
    class _Exploding:
        def __call__(self, *a, **k):
            raise RuntimeError("FAILED_PRECONDITION: serialized executable "
                               "compiled against a different libtpu")

    real_load = aot.load_or_compile

    def fake_load(tag, jit_fn, args, *, extra=()):
        return _Exploding(), "loaded"

    exec1, how = fake_load("t", _jit_fn(), args)
    assert how == "loaded"
    try:
        exec1(params, x)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    assert aot.purge("t") >= 1  # buildB artifact dropped
    f, how = real_load("t", _jit_fn(), args, extra=())
    assert how == "compiled"
    np.testing.assert_allclose(np.asarray(f(params, x)["y"]), np.ones(4))


def test_corrupt_artifact_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDIOLCM_AOT_CACHE", str(tmp_path))
    params = {"w": jnp.ones((4,))}
    x = jnp.ones((4,))
    key = aot.source_fingerprint(())
    bad = tmp_path / f"t-{key}.pkl"
    bad.write_bytes(b"not a pickle")
    f, how = aot.load_or_compile("t", _jit_fn(), (params, x, 0), extra=())
    assert how == "compiled"
    np.testing.assert_allclose(np.asarray(f(params, x)["y"]), np.ones(4))
