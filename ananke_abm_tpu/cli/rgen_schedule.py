"""``rgen_schedule`` CLI (option-name parity with the reference
src/ananke_abm/models/gen_schedule/cli.py:10-99): prepare, fit,
sample-population, eval-population, viz-population, compute-pds,
prepare-crf-data, train-crf, compare-samples, metric-tables, plot-overview.

``ANANKE_PLATFORM=cpu`` (or any jax platform name) pins the backend
before first use — the container's sitecustomize pins
``JAX_PLATFORMS=axon`` so plain env vars cannot flip it (CLAUDE.md),
and CLI runs must be able to stay off the TPU while a measurement job
holds it.
"""
from __future__ import annotations

import os

import click

if os.environ.get("ANANKE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["ANANKE_PLATFORM"])


@click.group()
def main():
    """TPU-native schedule-generation pipelines."""


@main.command()
@click.option("--activities", type=click.Path(exists=True), required=True)
@click.option("--grid", type=int, default=10)
@click.option("--out", type=click.Path(), required=True)
@click.option("--val-frac", type=float, default=0.2)
@click.option("--seed", type=int, default=42)
def prepare(activities, grid, out, val_frac, seed):
    """Rasterize an activities CSV into the (N, L) training grid."""
    from ananke_abm_tpu.dataio.rasterize import prepare_from_csv

    prepare_from_csv(activities, out, grid_min=grid, val_frac=val_frac, seed=seed)
    click.echo(f"Prepared grid at {out}")


@main.command("fit")
@click.option("--config", type=click.Path(exists=True), required=True)
@click.option("--output-dir", type=click.Path(), default="runs")
@click.option("--seed", type=int, default=123)
@click.option("--resume", is_flag=True, default=False,
              help="Restore params/opt state from last.ckpt and continue.")
@click.option("--data-parallel", is_flag=True, default=False,
              help="Shard batches over all attached devices (agents axis).")
@click.option("--epochs-per-jit", type=int, default=None,
              help="Fuse this many epochs into one jitted scan (overrides "
                   "train.epochs_per_jit; >1 amortizes per-epoch dispatch).")
def fit(config, output_dir, seed, resume, data_parallel, epochs_per_jit):
    """Train a schedule VAE from a YAML/JSON config."""
    from ananke_abm_tpu.models.gen_schedule.pipeline.train import train
    from ananke_abm_tpu.utils import load_config

    mesh = None
    if data_parallel:
        from ananke_abm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(zone_parallel=1)
    if epochs_per_jit is not None:
        config = load_config(config)
        config["train"]["epochs_per_jit"] = int(epochs_per_jit)
    train(config, output_dir, seed, resume=resume, mesh=mesh)
    click.echo(f"Training complete in {output_dir}")


@main.command("sample-population")
@click.option("--ckpt", "ckpt_path", type=click.Path(exists=True), required=True)
@click.option("--num-samples", default=10000, show_default=True)
@click.option("--outprefix", type=click.Path(), required=True)
@click.option("--seed", default=123, show_default=True)
@click.option("--csv-max-persons", default=200, show_default=True)
@click.option("--decode-mode", type=click.Choice(["argmax", "crf"]),
              default="argmax", show_default=True)
@click.option("--crf-path", type=click.Path(exists=True), default=None)
@click.option("--enforce-nonhome", is_flag=True, default=False, show_default=True)
@click.option("--reject-all-home", is_flag=True, default=False, show_default=True)
@click.option("--data-parallel", is_flag=True, default=False,
              help="Shard chunk batches over all attached devices.")
def sample_population(ckpt_path, num_samples, outprefix, seed,
                      csv_max_persons, decode_mode, crf_path,
                      enforce_nonhome, reject_all_home, data_parallel):
    """Generate a synthetic population from a trained checkpoint."""
    from ananke_abm_tpu.models.gen_schedule.pipeline.sample import sample

    mesh = None
    if data_parallel:
        from ananke_abm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(zone_parallel=1)
    sample(ckpt_path, num_samples, outprefix, seed, csv_max_persons,
           decode_mode, crf_path, enforce_nonhome, reject_all_home,
           mesh=mesh)
    click.echo(f"Sampled {num_samples} individuals to {outprefix}.npz")


@main.command("eval-population")
@click.option("--samples", "samples_npz_path", type=click.Path(exists=True), required=True)
@click.option("--samples-meta", "samples_meta_path", type=click.Path(exists=True), required=True)
@click.option("--reference", "reference_grid_path", type=click.Path(exists=True), required=True)
@click.option("--out-json", "out_json_path", type=click.Path(), required=True)
def eval_population(samples_npz_path, samples_meta_path, reference_grid_path, out_json_path):
    """Metric report JSON for a generated population vs a reference grid."""
    from ananke_abm_tpu.models.gen_schedule.pipeline.eval import evaluate

    evaluate(samples_npz_path, samples_meta_path, reference_grid_path, out_json_path)
    click.echo(f"Evaluation complete. Report saved to {out_json_path}.")


@main.command("viz-population")
@click.option("--samples", "samples_npz_path", type=click.Path(exists=True), required=True)
@click.option("--samples-meta", "samples_meta_path", type=click.Path(exists=True), required=True)
@click.option("--outdir", "outdir_path", type=click.Path(), required=True)
@click.option("--reference", "reference_grid_path", type=click.Path(), default="")
@click.option("--not-use-logits", is_flag=True, default=False, show_default=True)
def viz_population(samples_npz_path, samples_meta_path, outdir_path,
                   reference_grid_path, not_use_logits):
    """Plots for a generated population."""
    from ananke_abm_tpu.models.gen_schedule.pipeline.viz import visualize

    visualize(samples_npz_path, samples_meta_path, outdir_path,
              reference_grid_path, use_logits=not not_use_logits)
    click.echo(f"Visualization complete. Plots saved to {outdir_path}.")


@main.command("compute-pds")
@click.option("--grid", type=click.Path(exists=True), required=True)
@click.option("--out", type=click.Path(), required=True)
@click.option("--grid-min", type=int, required=True)
@click.option("--purpose-json", type=click.Path(exists=True), default=None)
def compute_pds_cli(grid, out, grid_min, purpose_json):
    """Purpose Distribution Space statistics from a rasterized grid."""
    import json

    from ananke_abm_tpu.models.gen_schedule.pds import compute_pds

    summary = compute_pds(grid, out, grid_min, purpose_json)
    click.echo(json.dumps(summary, indent=2))


@main.command("prepare-crf-data")
@click.option("--vae_ckpt", type=click.Path(exists=True), required=True)
@click.option("--splits", "splits_path", type=click.Path(exists=True), required=True,
              help="Splits npz with train_idx/val_idx (from prepare).")
@click.option("--outdir", type=click.Path(), required=True)
@click.option("--batch_size", type=int, default=1024)
def prepare_crf_data_cmd(vae_ckpt, splits_path, outdir, batch_size):
    """Freeze a trained VAE, dump (U, Y) pairs for CRF training."""
    from ananke_abm_tpu.models.gen_schedule.crf.prepare import prepare_crf_data

    prepare_crf_data(vae_ckpt, splits_path, outdir, batch_size)
    click.echo(f"[prepare-crf-data] wrote crf_train/val npz + meta to {outdir}")


@main.command("train-crf")
@click.option("--cfg", "cfg_path", type=click.Path(exists=True), required=True)
@click.option("--data-parallel", is_flag=True, default=False,
              help="Shard (U, Y) batches over all attached devices.")
def train_crf_cmd(cfg_path, data_parallel):
    """Train a TransitionCRF from a crf_config.yaml."""
    from ananke_abm_tpu.models.gen_schedule.crf.train import train_crf
    from ananke_abm_tpu.utils import load_config

    mesh = None
    if data_parallel:
        from ananke_abm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(zone_parallel=1)
    train_crf(load_config(cfg_path), mesh=mesh)


@main.command("compare-samples")
@click.option("--sample", "samples", multiple=True, required=True,
              help="name=<npz_prefix>; expects <prefix>.npz and <prefix>_meta.json.")
@click.option("--reference", type=click.Path(exists=True), required=True)
@click.option("--outdir", type=click.Path(), required=True)
@click.option("--no-plots", is_flag=True, default=False)
def compare_samples_cmd(samples, reference, outdir, no_plots):
    """Compare several sample-population outputs against one reference."""
    from ananke_abm_tpu.models.gen_schedule.pipeline.comparisons import (
        compare_samples,
    )

    specs = []
    for s in samples:
        name, prefix = s.split("=", 1)
        specs.append((name, f"{prefix}.npz", f"{prefix}_meta.json"))
    compare_samples(specs, reference, outdir, make_plots=not no_plots)
    click.echo(f"Comparison written to {outdir}")


@main.command("metric-tables")
@click.option("--ref-npz", type=click.Path(exists=True), required=True)
@click.option("--ref-meta", type=click.Path(exists=True), required=True)
@click.option("--compare-dir", type=click.Path(exists=True), required=True)
@click.option("--outdir", type=click.Path(), required=True)
def metric_tables_cli(ref_npz, ref_meta, compare_dir, outdir):
    """Run the full metric registry into CSV tables."""
    from ananke_abm_tpu.models.gen_schedule.compare.tables import metric_tables

    ran = metric_tables(ref_npz, ref_meta, compare_dir, outdir)
    click.echo(f"Ran metrics: {', '.join(ran)}")


@main.command("plot-overview")
@click.option("--ref-npz", type=click.Path(exists=True), required=True)
@click.option("--ref-meta", type=click.Path(exists=True), required=True)
@click.option("--compare-dir", type=click.Path(exists=True), required=True)
@click.option("--outdir", type=click.Path(), required=True)
def plot_overview_cli(ref_npz, ref_meta, compare_dir, outdir):
    """Lorenz+Gini overview, ToD curves, duration boxplots."""
    from ananke_abm_tpu.models.gen_schedule.compare.plot_viz import plot_overview

    plot_overview(ref_npz, ref_meta, compare_dir, outdir)
    click.echo(f"Overview plots saved to {outdir}")


if __name__ == "__main__":
    main()
