"""Probe whether this backend supports AOT executable serialization.

The cold-start plan (ROADMAP #1 / VERDICT r2 #5) is to cache compiled
executables across processes with jax.experimental.serialize_executable
(the persistent jax compilation cache HANGS through the axon
remote-compile relay — ENVIRONMENT_NOTES.md #3). That only works if the
PJRT plugin implements executable serialize/deserialize; this probe
answers that in ~a minute: compile a trivial program, serialize it,
deserialize IN THE SAME PROCESS, run both, then re-exec a child process
that only deserializes (the cross-process case that matters).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_aot.py
       [--child BLOB]   (internal)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BLOB = "/tmp/aot_probe.bin"


def build():
    import jax
    import jax.numpy as jnp

    def f(x):
        return (x @ x.T).sum(axis=1)

    x = jnp.ones((256, 256), jnp.float32)
    jitted = jax.jit(f)
    t0 = time.time()
    compiled = jitted.lower(x).compile()
    t_compile = time.time() - t0
    want = compiled(x)
    from jax.experimental import serialize_executable as se
    t0 = time.time()
    blob, in_tree, out_tree = se.serialize(compiled)
    t_ser = time.time() - t0
    with open(BLOB, "wb") as fh:
        fh.write(blob)
    import pickle
    with open(BLOB + ".trees", "wb") as fh:
        pickle.dump((in_tree, out_tree), fh)
    # same-process deserialize
    t0 = time.time()
    loaded = se.deserialize_and_load(blob, in_tree, out_tree)
    got = loaded(x)
    t_deser = time.time() - t0
    import numpy as np
    ok = bool(np.allclose(np.asarray(want), np.asarray(got)))
    return {"compile_s": round(t_compile, 2), "serialize_s": round(t_ser, 3),
            "deserialize_run_s": round(t_deser, 3),
            "same_process_ok": ok, "blob_bytes": len(blob)}


def child():
    import pickle
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se
    with open(BLOB, "rb") as fh:
        blob = fh.read()
    with open(BLOB + ".trees", "rb") as fh:
        in_tree, out_tree = pickle.load(fh)
    t0 = time.time()
    loaded = se.deserialize_and_load(blob, in_tree, out_tree)
    got = loaded(jnp.ones((256, 256), jnp.float32))
    np.asarray(got)
    print(json.dumps({"cross_process_ok": True,
                      "deserialize_run_s": round(time.time() - t0, 3)}))


def main():
    if "--child" in sys.argv:
        child()
        return
    res = build()
    print(json.dumps(res), flush=True)
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    t0 = time.time()
    p = subprocess.run([sys.executable, __file__, "--child"],
                       capture_output=True, text=True, timeout=600, env=env)
    res["child_wall_s"] = round(time.time() - t0, 2)
    res["child_stdout"] = p.stdout.strip()[-400:]
    res["child_ok"] = p.returncode == 0
    if not res["child_ok"]:
        res["child_stderr_tail"] = p.stderr.strip()[-400:]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
