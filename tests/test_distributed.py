"""Two-process jax.distributed proof of the multi-host data path.

VERDICT r4 #4: spawn 2 CPU processes, initialize jax.distributed,
feed per-host rows through host_local_batch_to_global, run sharded SGD
steps, assert == single-process. This is the closest this container can
get to a real pod (reference equivalent: the SLURM multi-GPU launch at
scripts/m3/run_full_semi.sh:9) — it proves the rendezvous +
make_array_from_process_local_data + cross-process-psum composition the
single-process unit tests cannot.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference(N=16, D=4, steps=3, lr=0.1):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(N, D)).astype(np.float32)
    y = rng.normal(size=(N,)).astype(np.float32)
    w = np.zeros((D,), np.float32)
    losses = []
    for _ in range(steps):
        pred = X @ w
        losses.append(float(np.mean((pred - y) ** 2)))
        g = 2.0 * X.T @ (pred - y) / N
        w = w - lr * g
    return w, losses


def test_two_process_distributed_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker,
                "--coordinator", f"127.0.0.1:{port}",
                "--process-id", str(i),
                "--out", outs[i],
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i]}"

    results = []
    for o in outs:
        with open(o, encoding="utf-8") as f:
            results.append(json.load(f))

    # rendezvous saw both processes and all four global devices
    for i, r in enumerate(results):
        assert r["info"]["process_count"] == 2
        assert r["info"]["process_index"] == i
        assert r["info"]["global_devices"] == 4
        assert r["info"]["local_devices"] == 2
        assert r["x_is_fully_sharded"], (
            "host-local rows did not assemble into a fully-sharded "
            "global array"
        )
    # each host fed disjoint halves of the global batch
    assert results[0]["rows"] == [0, 8]
    assert results[1]["rows"] == [8, 16]

    # the sharded run reproduces the single-process trajectory exactly
    w_ref, losses_ref = _single_process_reference()
    for r in results:
        np.testing.assert_allclose(r["w"], w_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            r["losses"], losses_ref, rtol=1e-5, atol=1e-6
        )
    # both processes agree bit-for-bit on the replicated result
    assert results[0]["w"] == results[1]["w"]
