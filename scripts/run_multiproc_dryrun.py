"""Launch the 2-process distributed dryrun (BASELINE config 5 multi-host leg).

Spawns N CPU worker processes (4 virtual devices each), each running
``jax.distributed.initialize`` against a localhost coordinator, then the
sharded gated matching + distributed-BA workload over the GLOBAL
cross-process mesh. Writes out/multiproc{N}.json with the merged result.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_multiproc_dryrun.py [N]
"""
import json
import os
import subprocess
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    port = 12431
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    os.makedirs("out", exist_ok=True)
    procs = []
    outs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    for pid in range(n):
        outp = f"out/multiproc_{n}p_{pid}.json"
        outs.append(outp)
        procs.append(subprocess.Popen(
            [sys.executable, worker,
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(n),
             "--process-id", str(pid),
             "--out", outp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    t0 = time.time()
    rcs = [p.wait(timeout=900) for p in procs]
    wall = time.time() - t0
    reports = []
    for pid, (p, outp) in enumerate(zip(procs, outs)):
        if rcs[pid] != 0:
            err = p.stderr.read().decode(errors="replace")[-2000:]
            print(f"worker {pid} rc={rcs[pid]}:\n{err}", file=sys.stderr)
        elif os.path.exists(outp):
            with open(outp) as fh:
                reports.append(json.load(fh))
    ok = (len(reports) == n and all(r.get("ok") for r in reports)
          and all(r["n_processes"] == n for r in reports))
    merged = {
        "ok": bool(ok),
        "n_processes": n,
        "n_devices_global": reports[0]["n_devices_global"] if reports else 0,
        "wall_s": round(wall, 1),
        "workers": reports,
    }
    with open(f"out/multiproc{n}.json", "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps({k: v for k, v in merged.items() if k != "workers"}))
    for o in outs:
        try:
            os.remove(o)
        except OSError:
            pass
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
