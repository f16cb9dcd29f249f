"""``ananke`` CLI (parity with the reference src/ananke_abm/cli/__init__.py:
13-26 and run_models/*): traj-embed, gval-traj, visualize-combined-traj,
info. In the reference snapshot traj-embed/gval-traj point at a missing
module (SURVEY.md §2.8); here they are fully functional. Beyond parity:
gatode-train / gatode-serve expose the flagship GAT-ODE family
(BASELINE.json names gnn_embed as a required capability; the reference
never shipped it).

``ANANKE_PLATFORM=cpu`` pins the jax backend before first use (plain
env vars cannot — the container's sitecustomize pins
``JAX_PLATFORMS=axon``; see CLAUDE.md)."""
from __future__ import annotations

import os

import click

if os.environ.get("ANANKE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["ANANKE_PLATFORM"])


@click.group()
def main():
    """Ananke ABM TPU — trajectory synthesis toolkit."""


@main.command("traj-embed")
@click.option("--activities-csv", type=click.Path(exists=True), required=True)
@click.option("--purposes-csv", type=click.Path(exists=True), default=None)
@click.option("--crf-mode", type=click.Choice(["linear", "semi"]),
              default="linear", show_default=True)
@click.option("--epochs", type=int, default=100, show_default=True)
@click.option("--batch", "batch_size", type=int, default=32, show_default=True)
@click.option("--lr", type=float, default=1e-3, show_default=True)
@click.option("--val-ratio", type=float, default=0.1, show_default=True)
@click.option("--outdir", type=click.Path(), default="runs/traj_embed",
              show_default=True)
@click.option("--vae-only", is_flag=True, default=False)
@click.option("--semi-dmax-minutes", type=int, default=300, show_default=True)
@click.option("--seed", type=int, default=0)
@click.option("--data-parallel", is_flag=True, default=False,
              help="Shard batches over all attached devices (agents axis).")
def traj_embed(activities_csv, purposes_csv, crf_mode, epochs, batch_size,
               lr, val_ratio, outdir, vae_only, semi_dmax_minutes, seed,
               data_parallel):
    """Train the TrajEmbed model (full VAE+CRF or VAE-only)."""
    from ananke_abm_tpu.models.traj_syn.pipeline.train_full import (
        train_traj_embed,
    )

    mesh = None
    if data_parallel:
        from ananke_abm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(zone_parallel=1)
    res = train_traj_embed(
        activities_csv, purposes_csv, epochs=epochs, batch_size=batch_size,
        lr=lr, val_ratio=val_ratio, outdir=outdir, crf_mode=crf_mode,
        seed=seed, vae_only=vae_only, semi_Dmax_minutes=semi_dmax_minutes,
        mesh=mesh,
    )
    click.echo(f"Best val loss {res['best_val_loss']:.4f}; ckpt {res['ckpt']}")


@main.command("gval-traj")
@click.option("--ckpt", type=click.Path(exists=True), required=True)
@click.option("--num-gen", type=int, default=1000, show_default=True)
@click.option("--gen-csv", type=click.Path(), required=True)
@click.option("--val-csv", type=click.Path(exists=True), default=None)
@click.option("--eval-step-minutes", type=int, default=5, show_default=True)
@click.option("--crf-mode", type=click.Choice(["linear", "semi", "none"]),
              default=None)
@click.option("--semi-dmax-minutes", type=int, default=300, show_default=True)
@click.option("--summary-json", type=click.Path(), default=None)
@click.option("--use-samples/--no-use-samples", default=True, show_default=True)
@click.option("--seed", type=int, default=0)
def gval_traj(ckpt, num_gen, gen_csv, val_csv, eval_step_minutes, crf_mode,
              semi_dmax_minutes, summary_json, use_samples, seed):
    """Generate trajectories from a checkpoint and validate them."""
    import json

    from ananke_abm_tpu.models.traj_syn.pipeline.validate import gen_n_val_traj

    summary = gen_n_val_traj(
        ckpt, num_gen, gen_csv, val_csv, eval_step_minutes, crf_mode,
        semi_dmax_minutes, summary_json, use_samples, seed,
    )
    click.echo(json.dumps(summary, indent=2))


@main.command("visualize-combined-traj")
@click.option("--trajectory-csv", type=click.Path(exists=True), required=True)
@click.option("--outdir", type=click.Path(), required=True)
@click.option("--grid-min", type=int, default=5, show_default=True)
def visualize_combined_traj(trajectory_csv, outdir, grid_min):
    """Buffer grid + stacked/zoomed/lunch figures from a trajectory CSV."""
    import os

    from ananke_abm_tpu.utils.traj_fig.figures import (
        fig_primary_lunch_time,
        fig_specific_trajs,
        fig_stacked_traj,
    )
    from ananke_abm_tpu.utils.traj_fig.make_buffer_grid import make_buffer_grid

    os.makedirs(outdir, exist_ok=True)
    Y, pm, _ = make_buffer_grid(trajectory_csv, grid_min=grid_min)
    fig_stacked_traj(Y, pm, os.path.join(outdir, "stacked_traj.png"), grid_min)
    fig_specific_trajs(Y, pm, outdir, grid_min)
    fig_primary_lunch_time(Y, pm, outdir, grid_min)
    click.echo(f"Figures written to {outdir}")


@main.command("make-purposes")
@click.option("--activities-csv", type=click.Path(exists=True), required=True)
@click.option("--out-csv", type=click.Path(), required=True)
@click.option("--overrides", "--override-yaml", type=click.Path(exists=True),
              default=None)
@click.option("--override-csv", type=click.Path(exists=True), default=None)
@click.option("--persons-csv", type=click.Path(exists=True), default=None)
@click.option("--purpose-col", default="purpose")
@click.option("--start-col", default="startime")
@click.option("--dur-col", default="total_duration")
@click.option("--person-col", default="persid")
@click.option("--day-col", default=None)
@click.option("--day-horizon-minutes", type=float, default=1440.0)
def make_purposes_cmd(activities_csv, out_csv, overrides, override_csv,
                      persons_csv, purpose_col, start_col, dur_col,
                      person_col, day_col, day_horizon_minutes):
    """Build the purposes catalog from an activities CSV (reference
    make_purposes.py option set)."""
    from ananke_abm_tpu.utils.make_purposes import build_purposes_catalog

    catalog = build_purposes_catalog(
        activities_csv, out_csv, overrides,
        override_csv=override_csv, persons_csv=persons_csv,
        purpose_col=purpose_col, start_col=start_col, dur_col=dur_col,
        person_col=person_col, day_col=day_col,
        day_horizon_minutes=day_horizon_minutes,
    )
    click.echo(f"Wrote {len(catalog)} purposes to {out_csv}")


@main.command("gatode-train")
@click.option("--outdir", type=click.Path(), default="runs/gatode",
              show_default=True)
@click.option("--n-agents", type=int, default=8192, show_default=True)
@click.option("--num-times", type=int, default=48, show_default=True)
@click.option("--num-zones", type=int, default=None,
              help="Zone count (default: the 8-zone mock world).")
@click.option("--epochs", type=int, default=10, show_default=True)
@click.option("--lr", type=float, default=1e-3, show_default=True)
@click.option("--batch", "batch_size", type=int, default=4096,
              show_default=True)
@click.option("--num-blocks", type=int, default=2, show_default=True)
@click.option("--method", type=click.Choice(["rk4", "dopri5"]),
              default="rk4", show_default=True)
@click.option("--seed", type=int, default=0)
@click.option("--sparse-world", is_flag=True, default=False,
              help="Edge-list zone graph end to end (no (Z, Z) array).")
@click.option("--data-parallel", is_flag=True, default=False,
              help="Shard each batch over all visible devices "
                   "(agent-axis mesh; no-op on one device).")
@click.option("--ckpt-every", type=int, default=0, show_default=True,
              help="Write gatode_last.ckpt (params+opt_state) every k "
                   "epochs (0 = final save only).")
@click.option("--resume", is_flag=True, default=False,
              help="Continue from outdir's gatode_last.ckpt; reproduces "
                   "the uninterrupted run exactly.")
def gatode_train(outdir, n_agents, num_times, num_zones, epochs, lr,
                 batch_size, num_blocks, method, seed, sparse_world,
                 data_parallel, ckpt_every, resume):
    """Train the flagship GAT-ODE model on a synthetic population."""
    from ananke_abm_tpu.models.gnn_embed.train import GATODEConfig, train

    config = GATODEConfig(
        epochs=epochs, lr=lr, batch_size=batch_size,
        num_blocks=num_blocks, method=method,
    )
    res = train(
        outdir, n_agents=n_agents, num_times=num_times, config=config,
        seed=seed, num_zones=num_zones, sparse_world=sparse_world,
        data_parallel=data_parallel, ckpt_every=ckpt_every, resume=resume,
    )
    click.echo(
        f"Final loss {res['final_loss']:.4f}, acc {res['final_acc']:.3f} "
        f"in {res['seconds']:.1f} s; ckpt {res['ckpt']}"
    )


@main.command("gatode-serve")
@click.option("--ckpt", type=click.Path(exists=True), required=True)
@click.option("--out-npz", type=click.Path(), required=True)
@click.option("--n-agents", type=int, default=4096, show_default=True)
@click.option("--num-times", type=int, default=None,
              help="Output grid size (default: the ckpt's).")
@click.option("--seed", type=int, default=1, show_default=True,
              help="Agent-population seed (the zone world comes from the ckpt).")
@click.option("--world-seed", type=int, default=None,
              help="Override the ckpt's zone-world seed (required for "
                   "checkpoints that predate the world keys).")
@click.option("--use-pallas", type=click.Choice(["auto", "on", "off"]),
              default="auto", show_default=True,
              help="Fused serving kernels: auto = measured dispatch rule "
                   "(TPU, MXU-aligned dims or N >= 131072).")
def gatode_serve(ckpt, out_npz, n_agents, num_times, seed, world_seed,
                 use_pallas):
    """Roll out a trained GAT-ODE over a fresh agent population."""
    from ananke_abm_tpu.models.gnn_embed.train import serve

    up = {"auto": "auto", "on": True, "off": False}[use_pallas]
    res = serve(ckpt, out_npz, n_agents=n_agents, num_times=num_times,
                seed=seed, world_seed=world_seed, use_pallas=up)
    click.echo(
        f"Served {res['n_agents']} agents x {res['num_times']} times in "
        f"{res['seconds']:.2f} s -> {res['out']}"
    )


@main.command("info")
def info():
    """Version + backend information."""
    import jax

    import ananke_abm_tpu

    click.echo(f"ananke_abm_tpu {ananke_abm_tpu.__version__}")
    click.echo(f"jax {jax.__version__}, backend {jax.default_backend()}, "
               f"{len(jax.devices())} device(s)")


if __name__ == "__main__":
    main()
