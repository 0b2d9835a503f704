"""Distribution comparison plots (the reference's paper-figure layer,
reference: experiments/concar_plots.jl:13-54 and siblings).

Boxplots of per-seed iterations and objectives for OUR solver (the
exact-instance replay results written by replay_reference.py) against the
reference's committed IPDDP2 / IPOPT / ProxDDP result files. For the
problems replayed from the reference's params dumps, every box summarizes
the SAME 100 instances.

Usage:
    python experiments/replay_reference.py          # once, writes *_replay.txt
    python experiments/plot_distributions.py [problem ...]

Writes experiments/plots/dist_<problem>.png.
"""

import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("REF", "/root/reference")
OUT = os.path.join(HERE, "plots")
os.makedirs(OUT, exist_ok=True)

PROBLEMS = ["concar", "concar_quad", "cartpole_friction", "acrobot_contact",
            "pushing_1_obs"]


def read_rows(path):
    """[iterations, success, objective] per seed from any of the three
    result formats (whitespace table with or without header)."""
    rows = []
    with open(path) as io:
        for line in io:
            m = re.split(r"\s+", line.strip())
            if len(m) < 5 or not m[0].isdigit():
                continue
            rows.append((int(m[1]), m[2] == "true", float(m[3])))
    return rows


def sources(problem):
    out = {}
    ours = os.path.join(HERE, "results", f"{problem}_replay.txt")
    if not os.path.exists(ours):
        # fall back to the randomized campaign results
        ours = os.path.join(HERE, "results", f"{problem}.txt")
    if os.path.exists(ours):
        out["ipddp2tpu"] = ours
    ref = os.path.join(REF, "experiments", "ipddp2", "results",
                       f"{problem}.txt")
    if os.path.exists(ref):
        out["IPDDP2 (ref)"] = ref
    ipopt = os.path.join(REF, "experiments", "ipopt", "results",
                         f"{problem}.txt")
    if os.path.exists(ipopt):
        out["IPOPT"] = ipopt
    prox = os.path.join(REF, "experiments", "proxddp", "results",
                        f"{problem}.txt")
    if os.path.exists(prox):
        out["ProxDDP"] = prox
    return out


def plot(problem):
    src = sources(problem)
    if "ipddp2tpu" not in src:
        print(f"{problem}: no local results (run replay_reference.py or "
              "run_benchmarks.py first), skipped")
        return
    data = {name: read_rows(path) for name, path in src.items()}

    fig, axes = plt.subplots(1, 2, figsize=(10, 4.2))
    names = list(data)
    for ax, field, label in ((axes[0], 0, "iterations"),
                             (axes[1], 2, "objective")):
        vals = [[r[field] for r in data[n] if r[1]] for n in names]
        ax.boxplot(vals, tick_labels=[
            f"{n}\n({sum(r[1] for r in data[n])}/{len(data[n])})"
            for n in names], showfliers=True)
        ax.set_ylabel(label)
        if field == 2 and problem.startswith("pushing"):
            ax.set_yscale("log")
    fig.suptitle(f"{problem}: converged-seed distributions "
                 "(x-labels: solved/total)")
    fig.tight_layout()
    path = os.path.join(OUT, f"dist_{problem}.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)


if __name__ == "__main__":
    for problem in (sys.argv[1:] or PROBLEMS):
        plot(problem)
