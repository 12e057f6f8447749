"""Offline tensor visualization for collector / stats dumps.

TPU-native analog of the reference's plot helpers (``xfuser/compact/plot.py``:
``plot_3d`` at :8, ``plot_low_rank_factors`` at :30, ``plot_eigenvalue_cumsum``
at :85) — the interactive 3D/heatmap views used to eyeball activation
structure, low-rank factors, and delta spectra when tuning compression
configs.  Everything here is host-side numpy + matplotlib and runs offline on
artifacts the runtime already produces:

  * ``utils.collector`` ``.npy`` dumps (``CFTPU_COLLECT_DIR``) — per
    (name, rank, step, layer) activations;
  * ``compact.stats.StatsLogger.dump_eigenvalues`` JSON — per-key singular
    value spectra grouped ``[step][layer] -> [sv...]``.

Nothing imports this from the hot path; matplotlib loads lazily with the Agg
backend so it is safe on headless hosts.

CLI::

    python -m compactfusion_tpu.utils.tensor_viz --collect_dir /tmp/dump \
        --out plots/viz                      # 3D surface per dumped tensor
    python -m compactfusion_tpu.utils.tensor_viz --eigenvalues spectra.json \
        --out plots/viz                      # cumulative-energy CDFs
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _as_2d(arr: np.ndarray) -> np.ndarray:
    """Collapse an activation of any rank to (tokens, channels): leading axes
    up to the second-to-last fold into tokens, the last axis is channels —
    matches the (N, C) view the codecs compress (``compact/codecs.py``)."""
    a = np.asarray(arr)
    if a.ndim == 1:
        return a[None, :]
    return a.reshape(-1, a.shape[-1])


def _decimate(a: np.ndarray, max_rows: int, max_cols: int) -> np.ndarray:
    """Strided downsample so surface plots stay renderable for video-scale
    tensors (S ~ 100k); stride keeps the global shape, unlike a crop."""
    r = max(1, int(np.ceil(a.shape[0] / max_rows)))
    c = max(1, int(np.ceil(a.shape[1] / max_cols)))
    return a[::r, ::c]


def plot_3d(
    tensor,
    title: str,
    path: Optional[str] = None,
    max_tokens: int = 256,
    max_channels: int = 256,
) -> str:
    """3D surface of a (token, channel) activation (reference ``plot_3d``,
    ``compact/plot.py:8-27``).  Accepts any array-like of any rank; big
    tensors are strided down to at most (max_tokens, max_channels) vertices.
    Returns the written path."""
    plt = _plt()
    z = _decimate(_as_2d(np.asarray(tensor, dtype=np.float32)), max_tokens, max_channels)
    x, y = np.meshgrid(np.arange(z.shape[1]), np.arange(z.shape[0]))
    fig = plt.figure(figsize=(10, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_surface(x, y, z, cmap="coolwarm", linewidth=0, antialiased=False)
    ax.set_xlabel("Channel")
    ax.set_ylabel("Token")
    ax.set_zlabel("Value")
    ax.set_title(title)
    if path is None:
        path = f"3d_{title}.png"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_low_rank_factors(
    u, v, key: str, step: int, save_dir: str = "."
) -> str:
    """Side-by-side heatmaps of a rank-k factor pair (reference
    ``plot_low_rank_factors``, ``compact/plot.py:30-83``).  ``u`` is (N, K),
    ``v`` is (K, C) — exactly the payload of the LOW_RANK codec
    (``compact/lowrank.py``)."""
    plt = _plt()
    u_np = _as_2d(np.asarray(u, dtype=np.float32))
    v_np = _as_2d(np.asarray(v, dtype=np.float32))
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    fig.suptitle(f"low-rank factors {key} step{step}")
    for ax, (m, name, xl, yl) in zip(
        axes,
        [(u_np, "U", "rank", "tokens"), (v_np, "V", "channels", "rank")],
    ):
        im = ax.imshow(_decimate(m, 2048, 2048), aspect="auto", cmap="viridis")
        ax.set_title(f"{name} {m.shape}")
        ax.set_xlabel(xl)
        ax.set_ylabel(yl)
        fig.colorbar(im, ax=ax)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{key}_step{step}_uv.png")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_eigenvalue_cumsum(
    spectra: Dict[str, List],
    save_dir: str = ".",
    keys: Optional[Sequence[str]] = None,
    log_scale: bool = True,
) -> List[str]:
    """Cumulative singular-value energy per key (reference
    ``plot_eigenvalue_cumsum``, ``compact/plot.py:85-267``): how much of a
    delta's energy the top-k ranks capture — THE plot that motivates the
    low-rank codec rank choice.  ``spectra`` is the
    ``StatsLogger.dump_eigenvalues`` dict: key -> flat per-call spectra or
    ``[step][layer] -> [sv...]`` when grouped by depth.  Each key gets one
    figure with a curve per (step, layer) sample (decimated to <=32 curves)
    plus an iid-Gaussian reference curve.  Returns written paths."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    paths = []
    for key, rows in spectra.items():
        if keys is not None and key not in keys:
            continue
        # normalize to a list of (label, spectrum)
        flat = []
        if rows and isinstance(rows[0][0], (list, tuple)):
            for si, layers in enumerate(rows):
                for li, sv in enumerate(layers):
                    flat.append((f"s{si}l{li}", np.asarray(sv, np.float64)))
        else:
            flat = [(f"#{i}", np.asarray(sv, np.float64)) for i, sv in enumerate(rows)]
        if not flat:
            continue
        stride = max(1, len(flat) // 32)
        fig, ax = plt.subplots(figsize=(8, 5))
        for label, sv in flat[::stride]:
            sv = np.sort(sv)[::-1]
            tot = sv.sum()
            if tot <= 0:
                continue
            ax.plot(np.arange(1, sv.size + 1), np.cumsum(sv) / tot,
                    alpha=0.6, label=label if len(flat[::stride]) <= 8 else None)
        # iid-Gaussian baseline at the same spectrum length: what "no
        # structure" looks like, so concentration is readable at a glance
        n = flat[0][1].size
        gsv = np.linalg.svd(
            np.random.default_rng(0).normal(size=(min(4 * n, 1024), n)),
            compute_uv=False,
        )[:n]
        ax.plot(np.arange(1, gsv.size + 1), np.cumsum(gsv) / gsv.sum(),
                "k--", label="iid gaussian")
        if log_scale:
            ax.set_xscale("log")
        ax.set_xlabel("rank k")
        ax.set_ylabel("cumulative energy")
        ax.set_title(f"singular-value energy: {key}")
        ax.legend(loc="lower right", fontsize=7)
        path = os.path.join(save_dir, f"svcumsum_{key.replace('/', '_')}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def render_collector_dir(
    collect_dir: str,
    out_dir: str,
    names: Optional[Sequence[str]] = None,
    limit: int = 64,
) -> List[str]:
    """Render every ``.npy`` activation in a ``utils.collector`` dump
    directory as a 3D surface (file stem -> ``3d_<stem>.png``).  ``names``
    filters by tensor name prefix (q/k/v/latents/...); ``limit`` caps the
    number of figures."""
    paths = []
    for fn in sorted(os.listdir(collect_dir)):
        if not fn.endswith(".npy"):
            continue
        stem = fn[:-4]
        if names is not None and not any(stem.startswith(n) for n in names):
            continue
        arr = np.load(os.path.join(collect_dir, fn))
        paths.append(plot_3d(arr, stem, os.path.join(out_dir, f"3d_{stem}.png")))
        if len(paths) >= limit:
            break
    return paths


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--collect_dir", help="utils.collector dump directory")
    p.add_argument("--eigenvalues", help="StatsLogger.dump_eigenvalues JSON")
    p.add_argument("--out", default="plots/viz", help="output directory")
    p.add_argument("--names", nargs="*", default=None,
                   help="tensor-name prefixes to render from --collect_dir")
    p.add_argument("--limit", type=int, default=64)
    a = p.parse_args(argv)
    written: List[str] = []
    if a.collect_dir:
        written += render_collector_dir(a.collect_dir, a.out, a.names, a.limit)
    if a.eigenvalues:
        with open(a.eigenvalues) as f:
            written += plot_eigenvalue_cumsum(json.load(f), a.out)
    for w in written:
        print(w)
    return 0 if written else 1


if __name__ == "__main__":
    raise SystemExit(main())
