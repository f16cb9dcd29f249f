"""Crash recovery under a real SIGKILL (SURVEY §5 failure-recovery row).

VERDICT r4 #3: the earlier resume tests restore from a cleanly written
checkpoint; this one SIGKILLs the flagship trainer MID-RUN and asserts
(a) the atomically-written checkpoint on disk is complete and loadable,
(b) restarting with resume=True continues to a loss trajectory identical
to an uninterrupted run through the same epochs — i.e. the failure is
fully recoverable, matching the reference's re-launch + restore story
(orbax-style async checkpointing, utils/ckpt.py).
"""
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from ananke_abm_tpu.models.gnn_embed.train import GATODEConfig, train
from ananke_abm_tpu.utils import load_checkpoint


def _cfg(epochs):
    # must match tests/_crash_worker.py
    return GATODEConfig(
        zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
        gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
        batch_size=32, epochs=epochs,
    )


_RUN_KW = dict(n_agents=256, num_times=6, num_zones=10, seed=5)


@pytest.mark.slow
def test_sigkill_midrun_then_resume_matches_uninterrupted(tmp_path):
    outdir = str(tmp_path / "killed")
    worker = os.path.join(os.path.dirname(__file__), "_crash_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    proc = subprocess.Popen(
        [sys.executable, worker, outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    last_ckpt = os.path.join(outdir, "gatode_last.ckpt")
    try:
        # wait for the first checkpoint, then let it get mid-epoch
        deadline = time.time() + 240
        while not os.path.exists(last_ckpt):
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise AssertionError(f"worker died before ckpt:\n{out}")
            if time.time() > deadline:
                raise AssertionError("no checkpoint within 240s")
            time.sleep(0.05)
        time.sleep(0.7)  # land the kill somewhere inside a later epoch
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)

    # killed, not completed: 500 epochs can't have finished
    assert proc.returncode == -signal.SIGKILL
    assert not os.path.exists(os.path.join(outdir, "gatode_best.ckpt"))

    # (a) the atomic write left a complete, loadable checkpoint
    ck = load_checkpoint(last_ckpt)
    k = int(ck["epoch"])
    assert 1 <= k < 500
    assert len(ck["history"]) == k
    for leaf in jax.tree_util.tree_leaves(ck["params"]):
        assert np.isfinite(np.asarray(leaf)).all()

    # a half-written tmp file from a crash mid-write must never shadow
    # the real checkpoint (save goes to .tmp, then os.replace)
    with open(last_ckpt + ".tmp", "wb") as f:
        f.write(b"garbage from a crash mid-write")

    # (b) resume continues to the same trajectory as an uninterrupted run
    target = k + 2
    resumed = train(
        outdir, config=_cfg(epochs=target), resume=True, **_RUN_KW
    )
    straight = train(
        str(tmp_path / "straight"), config=_cfg(epochs=target), **_RUN_KW
    )

    h_r = load_checkpoint(resumed["ckpt"])["history"]
    h_s = load_checkpoint(straight["ckpt"])["history"]
    assert [r["epoch"] for r in h_r] == [r["epoch"] for r in h_s]
    np.testing.assert_allclose(
        [r["loss"] for r in h_r], [r["loss"] for r in h_s],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        resumed["final_loss"], straight["final_loss"], rtol=1e-5
    )
