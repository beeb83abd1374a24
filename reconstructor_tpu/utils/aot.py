"""Cross-process AOT executable cache for the cold-start problem.

Compiles through this environment's remote-compile relay cost tens of
seconds per program (~10 hot programs => minutes of cold start,
BENCH_r02 detect_cold_s = 99.5 s), and the persistent jax compilation
cache HANGS through the relay (ENVIRONMENT_NOTES.md #3). The remaining
lever is ``jax.experimental.serialize_executable``: serialize the
compiled executable itself and reload it in later processes, skipping
XLA (and the relay) entirely.

ON BY DEFAULT (r4): the cache dir is ``RECON_AOT_CACHE`` if set, else
``~/.cache/reconstructor_tpu/aot``; set ``RECON_AOT_CACHE=off`` (or
``0``/empty) to disable. Every cache interaction falls back to the
plain jitted call on any error. ``scripts/probe_aot.py`` answers
whether the backend supports the mechanism at all.

Staleness safety: the cache key folds in a fingerprint of the LOWERED
program (``jitted.lower(...).as_text()``), so any code edit reachable
from a cached function changes the key and recompiles. Lowering is
local tracing only — it never touches the remote-compile relay, so the
cold-start win is preserved (lowering is ~100 ms vs ~20-40 s compiles).

Capability parity note: the reference has no cold-start problem to solve
(C++ AOT by construction); this is the TPU-native equivalent of shipping
a compiled binary.
"""

from __future__ import annotations

import hashlib
import os
import pickle

_mem: dict = {}
_MISS = object()          # tombstone: load failed once, don't retry


def cache_dir() -> str:
    v = os.environ.get("RECON_AOT_CACHE")
    if v is None:
        return os.path.join(os.path.expanduser("~"), ".cache",
                            "reconstructor_tpu", "aot")
    if v.strip().lower() in ("", "0", "off", "none", "disable", "disabled"):
        return ""
    return v


def _key(name: str, args, statics) -> str:
    import jax

    dev = jax.devices()[0]
    sig = [name, jax.__version__, dev.platform,
           getattr(dev, "device_kind", "?")]
    for a in args:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            sig.append(f"{tuple(a.shape)}:{a.dtype}")   # str() covers
            # extended dtypes (typed PRNG keys) np.dtype() rejects
        else:
            sig.append(repr(a))
    for k in sorted(statics):
        sig.append(f"{k}={statics[k]!r}")
    return hashlib.sha256("|".join(sig).encode()).hexdigest()[:24]


def call(name: str, jitted, *args, **statics):
    """``jitted(*args, **statics)`` through the executable cache.

    ``statics`` must be exactly the jitted function's static kwargs;
    dynamic operands are positional. With ``RECON_AOT_CACHE`` unset this
    is a plain call with zero overhead beyond the env lookup.
    """
    d = cache_dir()
    if not d:
        return jitted(*args, **statics)
    try:
        prekey = _key(name, args, statics)
    except Exception:
        return jitted(*args, **statics)
    exe = _mem.get(prekey)
    if exe is _MISS:
        return jitted(*args, **statics)
    if exe is None:
        try:
            # Lower locally (no relay) and fingerprint the actual program
            # text: a stale on-disk executable can never be served after
            # a code change (ADVICE r3: the shape-only key silently served
            # stale binaries).
            lowered = jitted.lower(*args, **statics)
            fp = hashlib.sha256(
                lowered.as_text().encode()).hexdigest()[:16]
        except Exception:
            _mem[prekey] = _MISS
            return jitted(*args, **statics)
        key = f"{prekey}-{fp}"
        exe = _load(d, key)
        if exe is None:
            try:
                exe = lowered.compile()
                _store(d, key, exe)
            except Exception:
                _mem[prekey] = _MISS
                return jitted(*args, **statics)
        _mem[prekey] = exe
    try:
        return exe(*args)
    except Exception:
        _mem[prekey] = _MISS
        return jitted(*args, **statics)


def _load(d: str, key: str):
    path = os.path.join(d, key)
    if not (os.path.exists(path + ".bin") and os.path.exists(path + ".trees")):
        return None
    try:
        from jax.experimental import serialize_executable as se
        with open(path + ".bin", "rb") as fh:
            blob = fh.read()
        with open(path + ".trees", "rb") as fh:
            in_tree, out_tree = pickle.load(fh)
        return se.deserialize_and_load(blob, in_tree, out_tree)
    except Exception:
        return None


def _store(d: str, key: str, exe) -> None:
    try:
        from jax.experimental import serialize_executable as se
        os.makedirs(d, exist_ok=True)
        blob, in_tree, out_tree = se.serialize(exe)
        path = os.path.join(d, key)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path + ".bin")
        with open(tmp, "wb") as fh:
            pickle.dump((in_tree, out_tree), fh)
        os.replace(tmp, path + ".trees")
    except Exception:
        pass
