"""AOT executable cache (utils/aot.py): disk round-trip + fallback."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reconstructor_tpu.utils import aot


@jax.jit
def _f(x):
    return x * 2.0 + 1.0


def test_roundtrip_and_disk_reload(tmp_path, monkeypatch):
    monkeypatch.setenv("RECON_AOT_CACHE", str(tmp_path))
    x = jnp.arange(8.0)
    want = np.asarray(_f(x))
    got = np.asarray(aot.call("f", _f, x))
    np.testing.assert_allclose(got, want)
    files = os.listdir(tmp_path)
    assert any(f.endswith(".bin") for f in files), files
    # simulate a fresh process: drop the in-memory executable
    aot._mem.clear()
    got2 = np.asarray(aot.call("f", _f, x))
    np.testing.assert_allclose(got2, want)
    # the reload path must not have recompiled into a new blob
    assert sorted(os.listdir(tmp_path)) == sorted(files)


def test_statics_change_key(tmp_path, monkeypatch):
    monkeypatch.setenv("RECON_AOT_CACHE", str(tmp_path))

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def g(x, k=1):
        return x * k

    x = jnp.ones(4)
    a = np.asarray(aot.call("g", g, x, k=2))
    b = np.asarray(aot.call("g", g, x, k=3))
    np.testing.assert_allclose(a, 2.0)
    np.testing.assert_allclose(b, 3.0)
    bins = [f for f in os.listdir(tmp_path) if f.endswith(".bin")]
    assert len(bins) == 2


def test_disabled_is_passthrough(monkeypatch):
    monkeypatch.delenv("RECON_AOT_CACHE", raising=False)
    x = jnp.arange(4.0)
    np.testing.assert_allclose(np.asarray(aot.call("f", _f, x)),
                               np.asarray(_f(x)))


def test_corrupt_blob_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("RECON_AOT_CACHE", str(tmp_path))
    x = jnp.arange(8.0)
    aot.call("f", _f, x)
    aot._mem.clear()
    for f in os.listdir(tmp_path):
        with open(os.path.join(tmp_path, f), "wb") as fh:
            fh.write(b"garbage")
    got = np.asarray(aot.call("f", _f, x))   # must not raise
    np.testing.assert_allclose(got, np.asarray(_f(x)))
