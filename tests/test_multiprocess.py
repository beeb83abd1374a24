"""REAL multi-process distributed run (BASELINE config 5 multi-host leg).

Spawns 2 OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed.initialize`` over a localhost coordinator — actual
multi-host runtime init + cross-process collectives through the same
library entry points (``match_and_gate_sharded``,
``solve_distributed``) the single-process virtual-mesh tests use. The
reference has no distributed capability at all (SURVEY.md §2 audit);
this is the leg a single process can never exercise.

Runs in subprocesses (the current process's jax is already initialized
single-process), ~30 s wall; marked ``multiprocess`` so it can be
deselected with ``-m 'not multiprocess'``.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.multiprocess
def test_two_process_distributed_dryrun(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_multiproc_dryrun.py"),
         "2"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(tmp_path / "out/multiproc2.json") as fh:
        rep = json.load(fh)
    assert rep["ok"] and rep["n_processes"] == 2
    assert rep["n_devices_global"] == 8
    w0, w1 = rep["workers"]
    # both processes must observe the SAME replicated solve result —
    # the collectives actually crossed the process boundary
    assert w0["ba_cost_final"] == w1["ba_cost_final"]
    assert w0["ba_cost_final"] < w0["ba_cost_initial"] / 100
