"""Paper-figure analog: ELBO / predictive quality vs wall-clock across
engines (the reference's NIPS-2014 experiment/plot scripts — SURVEY.md §2.2
"Experiments/plots"). Consumes the JSONL metrics emitted by
scripts/run_experiment.py / utils.logging.MetricsLogger.

Usage:
  python scripts/plot_comparison.py run_batchvb.jsonl run_svi.jsonl -o fig.png
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load_jsonl(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+", help="JSONL metric files, one per engine")
    ap.add_argument("-o", "--out", default="comparison.png")
    ap.add_argument("--metric", default=None,
                    help="metric key to plot (default: first of elbo/noisy_elbo/marginal_loglik present)")
    args = ap.parse_args()

    all_rows = {path: load_jsonl(path) for path in args.logs}
    has_pred = any("pred_ll" in r for rows in all_rows.values() for r in rows)
    ncols = 3 if has_pred else 2
    fig, axes = plt.subplots(1, ncols, figsize=(5.5 * ncols, 4.2))
    ax_time, ax_step = axes[0], axes[1]
    ax_pred = axes[2] if has_pred else None

    for path, rows in all_rows.items():
        key = args.metric
        if key is None:
            for cand in ("elbo", "noisy_elbo", "marginal_loglik"):
                if any(cand in r for r in rows):
                    key = cand
                    break
        label = Path(path).stem
        pts = [(r["wall_s"], r.get("step", i), r[key])
               for i, r in enumerate(rows) if key in r]
        if pts:
            ax_time.plot([p[0] for p in pts], [p[2] for p in pts], label=label)
            ax_step.plot([p[1] for p in pts], [p[2] for p in pts], label=label)
        if ax_pred is not None:
            # the reference paper's headline curve: held-out predictive
            # log-likelihood vs TRAINING wall-clock (pred_ll rows carry the
            # cumulative train wall explicitly, eval time excluded)
            pp = [(r["wall_s"], r["pred_ll"]) for r in rows if "pred_ll" in r]
            if pp:
                ax_pred.plot([p[0] for p in pp], [p[1] for p in pp],
                             marker="o", ms=3, label=label)

    ax_time.set_xlabel("wall-clock (s)")
    ax_time.set_ylabel("objective")
    ax_time.set_title("objective vs wall-clock")
    ax_step.set_xlabel("step")
    ax_step.set_title("objective vs step")
    ax_time.legend()
    if ax_pred is not None:
        ax_pred.set_xlabel("training wall-clock (s)")
        ax_pred.set_ylabel("held-out pred log-lik / obs")
        ax_pred.set_title("predictive LL vs wall-clock")
        ax_pred.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
