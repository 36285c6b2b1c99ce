"""Small-utility coverage: throughput meter, logger, mesh helpers."""

import os
import time

import numpy as np
import jax

from cervical_tpu.parallel import make_mesh, local_batch_slice, data_sharding
from cervical_tpu.utils import Logger, show_config, seed_everything, KeyChain
from cervical_tpu.utils.profiling import ThroughputMeter, trace


def test_throughput_meter():
    m = ThroughputMeter(window=10, num_chips=2)
    for _ in range(5):
        m.step(32)
        time.sleep(0.01)
    assert m.images_per_sec > 0
    assert abs(m.images_per_sec_per_chip - m.images_per_sec / 2) < 1e-6
    assert m.steps_per_sec > 0
    assert m.summary()["num_chips"] == 2


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "trace"), enabled=False):
        pass  # disabled path is a no-op


def test_logger_tee(tmp_path, capsys):
    lg = Logger(str(tmp_path), filename="t.log")
    lg.write("hello\n")
    lg.flush()
    lg.close()
    assert "hello" in open(tmp_path / "t.log").read()


def test_show_config(capsys):
    show_config(alpha=1, beta="x")
    out = capsys.readouterr().out
    assert "alpha" in out and "beta" in out


def test_seed_everything_and_keychain():
    k = seed_everything(3)
    assert k.shape == (2,)
    chain = KeyChain(3)
    a = chain.next()
    b = chain.next()
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    ks = chain.next(3)
    assert len(ks) == 3


def test_local_batch_slice_single_process():
    mesh = make_mesh()
    sl = local_batch_slice(64, mesh)
    assert sl == slice(0, 64)


def test_data_sharding_spec():
    mesh = make_mesh()
    sh = data_sharding(mesh, ndim=4)
    assert sh.spec[0] == "data"
    assert all(s is None for s in sh.spec[1:])


def test_initialize_from_cli_flag_parsing():
    """Launch flags are consumed (single-process: no init happens), other
    argv passes through; partial explicit flags raise a clear error."""
    import pytest
    from cervical_tpu.parallel import initialize_from_cli

    rest = initialize_from_cli(["--backbone", "mobilenet"])
    assert rest == ["--backbone", "mobilenet"]

    # --multihost false is consumed without initializing
    rest = initialize_from_cli(["--multihost", "false", "--epochs", "3"])
    assert rest == ["--epochs", "3"]

    with pytest.raises(SystemExit, match="ALL of"):
        initialize_from_cli(["--coordinator", "localhost:1234"])

    # any partial combo errors (not just coordinator-without-the-others)
    with pytest.raises(SystemExit, match="ALL of"):
        initialize_from_cli(["--num_processes", "2", "--process_id", "0"])

    # --flag=value form is consumed too
    rest = initialize_from_cli(["--multihost=false", "--epochs", "3"])
    assert rest == ["--epochs", "3"]

    with pytest.raises(SystemExit, match="requires a value"):
        initialize_from_cli(["--process_id"])
