"""Plot DMPO learning curves from a run's learner.csv.

Usage: python tools/plot_training.py runs/walk_on_ball [out.png]

The CSV may contain several appended runs (resumes / restarts); rows are
split into segments wherever `iteration` decreases and the LAST segment
(the current run) is plotted, with earlier segments shown faded.
"""

import csv
import os
import sys


def load_segments(path):
    rows = []
    with open(path) as f:
        for r in csv.DictReader(f):
            rows.append({k: float(v) for k, v in r.items()})
    segs, cur, last_it = [], [], None
    for r in rows:
        if last_it is not None and r["iteration"] < last_it:
            segs.append(cur)
            cur = []
        cur.append(r)
        last_it = r["iteration"]
    if cur:
        segs.append(cur)
    return segs


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/walk_on_ball"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        run_dir, "curve.png")
    segs = load_segments(os.path.join(run_dir, "learner.csv"))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    for i, (key, label) in enumerate((
            ("episode_return", "mean episode return"),
            ("reward", "mean per-step reward"),
            ("critic_loss", "critic loss"))):
        ax = axes[i]
        for s in segs[:-1]:
            ax.plot([r["actor_steps"] for r in s], [r[key] for r in s],
                    color="0.8", lw=0.8)
        s = segs[-1]
        ax.plot([r["actor_steps"] for r in s], [r[key] for r in s],
                color="C0", lw=1.4)
        ax.set_xlabel("env steps")
        ax.set_ylabel(label)
        ax.grid(alpha=0.3)
    fig.suptitle(os.path.basename(os.path.abspath(run_dir))
                 + " — fused DMPO on one TPU chip")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    s = segs[-1]
    print(f"segments: {len(segs)}; last run: {len(s)} points, "
          f"{s[-1]['actor_steps']:.3g} env steps, "
          f"return {s[0]['episode_return']:.2f} -> "
          f"{s[-1]['episode_return']:.2f}")
    print("wrote", out)


if __name__ == "__main__":
    main()
