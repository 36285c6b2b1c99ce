"""TRUE multi-process SPMD test: two OS processes (4 CPU devices each)
joined by jax.distributed into one 8-device mesh — the CPU-world analogue
of the reference's multi-node DDP+NCCL (train.py:288-294,375-390).
Upgrades the single-process virtual-device coverage: collectives really
cross a process boundary (Gloo), and shard_batch really assembles global
arrays from per-process local slices."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_spmd():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    port = 29700 + os.getpid() % 500
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own 4-device forcing
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=1200)[0].decode(errors="replace")
            for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
        assert f"proc {i}: MULTIHOST OK" in o, o[-1000:]
    # the gradient all-reduce must leave both processes with IDENTICAL
    # post-step parameters (the reference's DDP guarantee) — for the raw
    # fusion step AND for a full SegTrainer epoch
    for tag in ("checksum", "segsum"):
        sums = [line.split(tag)[1].strip().split()[0]
                for o in outs for line in o.splitlines() if tag in line]
        assert len(sums) == 2 and sums[0] == sums[1], (tag, sums)
