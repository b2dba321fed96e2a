"""2-process ``jax.distributed`` CPU integration test (VERDICT r3 #4).

Everything else in the suite simulates multi-chip with ONE process and 8
virtual devices; this test crosses a REAL process boundary: coordinator
bring-up, cross-process collectives (grad psum, ``process_allgather``), the
eval feature extract-and-gather, and the ShardedLoader per-process invariants.
Reference equivalents: ``Diffsound/sound_synthesis/distributed/launch.py:26-104``
(mp.spawn + NCCL init) and ``Codebook/evaluate.py:123-132`` (DDP shard +
``all_gather_object``) — which the reference could never run without GPUs
(SURVEY.md §4).

The workers run ``tests/_mp_worker.py`` in fresh interpreters (the current
process already holds an initialized single-process JAX backend).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")
NPROCS = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    data_dir = tmp_path / "mels"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):  # odd count -> unequal shards (3/2): exercises padding
        np.save(data_dir / f"clip{i}_sample_0.npy",
                rng.random((6, 8)).astype(np.float32))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub the parent's
    env.pop("XLA_FLAGS", None)

    procs, outs = [], []
    for pid in range(NPROCS):
        out_json = tmp_path / f"worker{pid}.json"
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(NPROCS),
             str(data_dir), str(out_json)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"

    reports = [json.loads(o.read_text()) for o in outs]
    for rep in reports:
        assert rep["devices"] == 2 * rep["local"]
        assert rep["eval_rows"] == 5
    # the dp loss is a REPLICATED global value: identical across processes
    assert reports[0]["dp_loss"] == pytest.approx(reports[1]["dp_loss"], rel=1e-6)
    # both processes saw the same (disjoint-union) loader id set
    assert reports[0]["loader_ids"] == reports[1]["loader_ids"]
    assert len(reports[0]["loader_ids"]) == 8  # 2 shards x 2 batches x 2 items
