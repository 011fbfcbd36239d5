"""Paper-figure sweep: secure-aggregation sync rate (sigma).

Mirrors ``figure_scripts/sigma.py`` of the reference: re-run federated
training at a range of ``sync_every_n_batch`` values, append the best
validation Matthews coefficient per run to a CSV, and render a summary
figure (mean +/- spread per sigma) with matplotlib.

    python figure_scripts/sigma.py --num_runs 3 [--data_dir DIR]
        [--epochs 5] [--sigmas 1 2 3 5 10]
    python figure_scripts/sigma.py --visualize
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).parent / "sigma_results.csv"


def writefile(file_name, input_dict: dict, headers: list) -> None:
    file_exists = os.path.isfile(file_name)
    with open(file_name, "a" if file_exists else "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=[str(h) for h in headers])
        if not file_exists:
            writer.writeheader()
        writer.writerow({str(k): v for k, v in input_dict.items()})


def visualize_file(file_name, out_png=None, xlabel="value"):
    import pandas as pd
    from matplotlib import pyplot as plt

    df = pd.read_csv(file_name)
    xs = sorted(df.columns, key=float)
    means = [df[c].dropna().mean() for c in xs]
    mins = [df[c].dropna().min() for c in xs]
    maxs = [df[c].dropna().max() for c in xs]

    fig, ax = plt.subplots(figsize=(6, 3.5))
    x = [float(c) for c in xs]
    # single series: validated categorical slot 1, band for run spread
    ax.fill_between(x, mins, maxs, color="#2a78d6", alpha=0.18, linewidth=0)
    ax.plot(x, means, color="#2a78d6", linewidth=2, marker="o", markersize=5)
    ax.set_xlabel(xlabel, color="#52514e")
    ax.set_ylabel("best val Matthews coeff", color="#52514e")
    ax.grid(color="#e7e6e3", linewidth=0.8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    fig.tight_layout()
    out = out_png or str(Path(file_name).with_suffix(".png"))
    fig.savefig(out, dpi=160)
    print(f"wrote {out}")


def base_args(cmd, sigma: int):
    from primia_tpu.config import Arguments

    return Arguments(
        name="sigmafigure",
        train_federated=True,
        unencrypted_aggregation=cmd.unencrypted_aggregation,
        data_dir=cmd.data_dir,
        batch_size=cmd.batch_size,
        train_resolution=cmd.resolution,
        inference_resolution=cmd.resolution,
        test_batch_size=10,
        test_interval=1,
        epochs=cmd.epochs,
        lr=1e-4,
        end_lr=1e-5,
        beta1=0.5,
        beta2=0.99,
        model=cmd.model,
        pooling_type="max",
        sync_every_n_batch=sigma,
        repetitions_dataset=1,
        weighted_averaging=True,
        deterministic=False,
        save_file="",
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--num_runs", type=int, default=1)
    p.add_argument("--sigmas", type=int, nargs="+", default=[1, 2, 3, 5, 10])
    p.add_argument("--data_dir", default="data/server_simulation")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--model", default="resnet-18")
    p.add_argument("--unencrypted_aggregation", action="store_true")
    cmd = p.parse_args(argv)

    if cmd.visualize:
        visualize_file(RESULTS, xlabel="sync_every_n_batch (sigma)")
        return 0

    from primia_tpu.train.loop import main as train_main

    for _ in range(cmd.num_runs):
        row = {}
        for sigma in cmd.sigmas:
            args = base_args(cmd, sigma)
            row[sigma] = train_main(args, verbose=False)
            print(f"sigma={sigma}: best val MCC {row[sigma]:.4f}")
        writefile(RESULTS, row, cmd.sigmas)
    return 0


if __name__ == "__main__":
    sys.exit(main())
