"""Multi-PROCESS data parallelism, executed for real.

The rest of the suite exercises multi-DEVICE sharding inside one process
(8 virtual CPU devices).  This test launches `scripts/multiprocess_dp.py`,
which spawns 2 coordinated OS processes through
`parallel/mesh.py:initialize_distributed` (jax.distributed + gloo CPU
collectives), builds a global 1-D data mesh spanning the processes,
assembles global batches from process-local shards, runs the jitted DP
acoustic train step, and compares per-step metrics against a single-process
control run (reduction-order tolerance; the script asserts and prints PASS).

Slow-marked: ~2-4 min on the 1-core CI host (two fresh interpreters, two
distributed CPU clients, a handful of compiles on first run).  Run with
`pytest tests/test_multiprocess.py -m slow`.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    env = dict(os.environ, SAMBERT_FORCE_CPU="1")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform via jax.config
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multiprocess_dp.py"),
         "--nproc", "2", "--steps", "3", "--batch-size", "8"],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout, proc.stdout
    summary = next(
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith("{")
    )
    assert summary["match"] is True
    assert summary["nproc"] == 2
    # the distributed run really trained: finite, non-degenerate loss
    assert summary["final_dist"]["total_loss"] > 0
