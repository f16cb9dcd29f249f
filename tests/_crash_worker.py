"""Worker for tests/test_crash_recovery.py: a flagship training run that
the parent test SIGKILLs mid-epoch. Writes gatode_last.ckpt every epoch
(atomic os.replace in utils/ckpt.py) — whenever the kill lands, the last
checkpoint on disk must be a complete, loadable state.

The config here must match tests/test_crash_recovery.py::_cfg exactly
(resume validates everything but `epochs`).
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from ananke_abm_tpu.models.gnn_embed.train import GATODEConfig, train


def main():
    outdir = sys.argv[1]
    train(
        outdir,
        n_agents=256,
        num_times=6,
        num_zones=10,
        seed=5,
        ckpt_every=1,
        config=GATODEConfig(
            zone_dim=16, agent_dim=8, context_dim=8, hidden_dim=16,
            gat_heads=2, gat_layers=1, num_blocks=1, substeps=1,
            batch_size=32, epochs=500,
        ),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
