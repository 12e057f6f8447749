"""Offline tensor-viz helpers (reference ``xfuser/compact/plot.py`` analog).

Renders real artifacts end-to-end: a collector dump directory and a
StatsLogger eigenvalue JSON, through the module CLI as well as the function
API, asserting non-empty PNGs come out."""

import json
import os

import numpy as np
import pytest

from compactfusion_tpu.utils import tensor_viz


def _nonempty_png(path):
    assert os.path.isfile(path), path
    assert os.path.getsize(path) > 1000, path
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_3d_shapes(tmp_path):
    rng = np.random.default_rng(0)
    # any-rank input collapses to (tokens, channels); big dims get decimated
    for shape in [(64,), (32, 16), (2, 1024, 4, 72)]:
        p = tensor_viz.plot_3d(
            rng.normal(size=shape), f"t{len(shape)}",
            str(tmp_path / f"t{len(shape)}.png"),
        )
        _nonempty_png(p)


def test_plot_low_rank_factors(tmp_path):
    rng = np.random.default_rng(1)
    p = tensor_viz.plot_low_rank_factors(
        rng.normal(size=(128, 4)), rng.normal(size=(4, 96)),
        key="12-0-k", step=7, save_dir=str(tmp_path),
    )
    _nonempty_png(p)
    assert "12-0-k_step7" in os.path.basename(p)


def test_eigenvalue_cumsum_both_layouts(tmp_path):
    rng = np.random.default_rng(2)
    sv = np.sort(rng.random(32))[::-1]
    spectra = {
        "flat-key": [sv.tolist(), (sv * 2).tolist()],
        # grouped-by-depth layout: [step][layer] -> [sv...]
        "grouped-key": [[sv.tolist(), sv.tolist()], [sv.tolist(), sv.tolist()]],
    }
    paths = tensor_viz.plot_eigenvalue_cumsum(spectra, save_dir=str(tmp_path))
    assert len(paths) == 2
    for p in paths:
        _nonempty_png(p)


def test_cli_collector_and_eigenvalues(tmp_path):
    rng = np.random.default_rng(3)
    dump = tmp_path / "dump"
    dump.mkdir()
    # collector naming: {name}_s{step}_l{layer}_r{rank}.npy
    np.save(dump / "k_s0_l1_r0.npy", rng.normal(size=(1, 64, 2, 8)))
    np.save(dump / "latents_n00000_r0.npy", rng.normal(size=(1, 16, 8)))
    (dump / "ignore.txt").write_text("not a tensor")
    spectra = tmp_path / "spectra.json"
    spectra.write_text(json.dumps({"k": [np.sort(rng.random(16))[::-1].tolist()]}))

    out = tmp_path / "viz"
    rc = tensor_viz.main([
        "--collect_dir", str(dump), "--eigenvalues", str(spectra),
        "--out", str(out), "--names", "k", "latents",
    ])
    assert rc == 0
    wrote = sorted(os.listdir(out))
    assert "3d_k_s0_l1_r0.png" in wrote
    assert "3d_latents_n00000_r0.png" in wrote
    assert any(w.startswith("svcumsum_") for w in wrote)
    for w in wrote:
        _nonempty_png(str(out / w))


def test_cli_nothing_to_do(tmp_path):
    assert tensor_viz.main(["--out", str(tmp_path)]) == 1
