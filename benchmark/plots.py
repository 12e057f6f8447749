"""Analysis figures from the JSON artifacts — the ``compact_plot`` analog.

The reference ships matplotlib tooling (``xfuser/compact/stats.py`` plot
methods, ``compact/plot.py``, ``compact_plot/plot_latency.ipynb``) that
rendered the paper's figures.  Here every measurement lands in a JSON
artifact first (machine-checkable); this script renders the figures from
them:

  * err-vs-step curves + eigenvalue-spectrum comparison (ANALYSIS_STATS.json)
  * quality vs wire-compression scatter (QUALITY_REAL_SCALE.json)
  * bytes/step per config bars (BYTES_NORTHSTAR.json)
  * latency per parallel factorization bars (LATENCY_SWEEP.json)

    python benchmark/plots.py --out plots/
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def plot_err_vs_step(report, out):
    fig, ax = plt.subplots(figsize=(5, 3.2))
    for codec, d in report["codecs"].items():
        ax.plot(d["rel_err_vs_step"], marker="o", label=codec)
    ax.set_xlabel("compressed denoise step")
    ax.set_ylabel("K reconstruction rel. error")
    ax.set_title("Error feedback converges (err vs step)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "err_vs_step.png"), dpi=150)
    plt.close(fig)


def plot_spectra(report, out):
    fig, ax = plt.subplots(figsize=(5, 3.2))
    codecs = list(report["codecs"])
    acts = [report["codecs"][c]["activation_top2_energy"] for c in codecs]
    dels = [report["codecs"][c]["delta_top2_energy"] for c in codecs]
    x = range(len(codecs))
    ax.bar([i - 0.2 for i in x], acts, 0.4, label="activation")
    ax.bar([i + 0.2 for i in x], dels, 0.4, label="step delta")
    ax.set_xticks(list(x), codecs, fontsize=8)
    ax.set_ylabel("top-2 SV energy fraction")
    ax.set_title("Spectral concentration: activation vs delta")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "spectra_top2.png"), dpi=150)
    plt.close(fig)


def plot_quality_vs_ratio(report, out):
    fig, ax = plt.subplots(figsize=(5, 3.2))
    for r in report["results"]:
        ax.scatter(r["wire_compression"], r["psnr_db"])
        ax.annotate(
            r["codec"], (r["wire_compression"], r["psnr_db"]),
            fontsize=7, xytext=(4, 4), textcoords="offset points",
        )
    ax.set_xscale("log")
    ax.axvline(100, ls="--", lw=0.8, color="gray")
    ax.set_xlabel("wire compression (x, log)")
    ax.set_ylabel("PSNR vs lossless (dB)")
    ax.set_title("Quality holds past the 100x line (0.61B, ring-8)")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "quality_vs_ratio.png"), dpi=150)
    plt.close(fig)


def plot_bytes(report, out):
    fig, ax = plt.subplots(figsize=(5.5, 3.2))
    rows = report["rows"]
    names = [r["config"] for r in rows]
    mb = [r["bytes_per_step_per_device"] / 1e6 for r in rows]
    raw = rows[0]["raw_bytes_per_step_per_device"] / 1e6
    ax.bar(names, mb)
    ax.axhline(raw, ls="--", lw=0.8, color="gray", label=f"raw ({raw:.0f} MB)")
    ax.set_yscale("log")
    ax.set_ylabel("MB/step/device (log)")
    ax.set_title(report["workload"])
    ax.tick_params(axis="x", labelsize=7, rotation=20)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "bytes_per_step.png"), dpi=150)
    plt.close(fig)


def plot_latency(report, out):
    rows = [r for r in report["rows"] if "latency_s" in r]
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(6, 3.2))
    ax.bar([r["config"] for r in rows], [r["latency_s"] for r in rows])
    ax.set_ylabel("latency (s)")
    ax.set_title(
        f"{report['model']} on {report['devices']}x{report['backend']}"
    )
    ax.tick_params(axis="x", labelsize=6, rotation=45)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "latency_sweep.png"), dpi=150)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(ROOT, "plots"))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    made = []
    r = _load("ANALYSIS_STATS.json")
    if r:
        plot_err_vs_step(r, args.out)
        plot_spectra(r, args.out)
        made += ["err_vs_step.png", "spectra_top2.png"]
    r = _load("QUALITY_REAL_SCALE.json")
    if r:
        plot_quality_vs_ratio(r, args.out)
        made.append("quality_vs_ratio.png")
    r = _load("BYTES_NORTHSTAR.json")
    if r:
        plot_bytes(r, args.out)
        made.append("bytes_per_step.png")
    r = _load("LATENCY_SWEEP.json")
    if r:
        plot_latency(r, args.out)
        made.append("latency_sweep.png")
    print(json.dumps({"out": args.out, "figures": made}))


if __name__ == "__main__":
    main()
