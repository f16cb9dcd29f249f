"""Sample-rate sequence-coverage analysis.

Library form of the reference's ad-hoc inspection notebook
(src/ananke_abm/gen_schedule_check/visualize_multi_samples.ipynb): for a
population subsample, how many of the full population's distinct
purpose-sequences survive, and what fraction of person-days those
surviving sequences cover. Used to pick a training subsample rate that
keeps behavioral diversity.
"""
from __future__ import annotations

from typing import Sequence

import pandas as pd


def sequence_counts(activities: pd.DataFrame,
                    person_col: str = "persid",
                    purpose_col: str = "purpose") -> pd.Series:
    """Per-person purpose-sequence value counts: each person contributes
    one sequence (their activities in CSV order); returns counts indexed
    by the stringified sequence."""
    seqs = (
        activities.groupby(person_col, sort=False)[purpose_col]
        .agg(tuple).map(str)
    )
    return seqs.value_counts()


def coverage_vs_full(full_counts: pd.Series,
                     sample_counts: pd.Series) -> dict:
    """Diversity retention of a subsample against the full population.

    Returns ``sampled_unique_sequences`` (fraction of the full
    population's distinct sequences that appear in the sample) and
    ``sampled_sequence_coverage`` (fraction of full person-days whose
    sequence is represented in the sample)."""
    present = full_counts.index.intersection(sample_counts.index)
    return {
        "sampled_unique_sequences": len(present) / max(1, len(full_counts)),
        "sampled_sequence_coverage": float(
            full_counts.loc[present].sum() / max(1, full_counts.sum())
        ),
    }


def sample_coverage_table(
    full_csv: str,
    sampled: Sequence[tuple[float, str]],
    person_col: str = "persid",
    purpose_col: str = "purpose",
    out_csv: str | None = None,
) -> pd.DataFrame:
    """Coverage table over (sample_rate, csv_path) pairs, anchored at
    rate 0 (nothing) and rate 1 (the full CSV), like the notebook's
    ``store_analysis`` frame."""
    full_counts = sequence_counts(
        pd.read_csv(full_csv), person_col, purpose_col
    )
    rows = [{"sample_rate": 0.0, "sampled_unique_sequences": 0.0,
             "sampled_sequence_coverage": 0.0}]
    for rate, path in sorted(sampled):
        counts = sequence_counts(pd.read_csv(path), person_col, purpose_col)
        rows.append({"sample_rate": float(rate),
                     **coverage_vs_full(full_counts, counts)})
    rows.append({"sample_rate": 1.0, "sampled_unique_sequences": 1.0,
                 "sampled_sequence_coverage": 1.0})
    table = pd.DataFrame(rows)
    if out_csv:
        table.to_csv(out_csv, index=False)
    return table


def plot_sample_coverage(table: pd.DataFrame, out_png: str) -> None:
    """Coverage / unique-sequence curves vs sample rate (the notebook's
    final plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(table["sample_rate"], table["sampled_unique_sequences"],
            marker="o", label="unique sequences retained")
    ax.plot(table["sample_rate"], table["sampled_sequence_coverage"],
            marker="s", label="person-day coverage")
    ax.set_xlabel("sample rate")
    ax.set_ylabel("fraction of full population")
    ax.set_ylim(0, 1.05)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
