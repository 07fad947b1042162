"""Regenerate the golden trajectories + replay graphs (results/golden,
results/replay).

Runs the PRODUCT pipeline (run_global_solve, so the shipped defaults --
auto init, DCS auto-retry -- are captured) in f64 on the CPU backend, 100
LM iterations, and commits:

* ``results/golden/<KEY>.npy``      -- the trajectory (poses array)
* ``results/golden/meta.json``      -- costs / iterations / solver strings
* ``results/replay/<KEY>.g2o``      -- the exact dirty graph (dataset +
  seeded injected outliers) for apples-to-apples replay through the
  reference binary (see results/replay/README.md for the command)

Covers every BASELINE.json config family: INTEL + M3500 at 0-100
outliers, CSAIL, and sphere2500 (SE(3)).  ~10-30 min on a warm cache
(M3500/sphere2500 are schur-f64 CPU solves).

Usage: python scripts/generate_golden.py [KEY ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "results", "golden")
REPLAY = os.path.join(os.path.dirname(__file__), "..", "results", "replay")

# (dataset, outliers, seed, method)
CONFIGS = [
    ("INTEL", 0, 0, 0),
    ("INTEL", 50, 42, 1),
    ("INTEL", 100, 42, 1),
    ("INTEL", 200, 42, 1),
    ("CSAIL", 0, 0, 0),
    ("CSAIL", 50, 42, 1),
    ("CSAIL", 200, 42, 1),
    ("M3500", 0, 0, 0),
    ("M3500", 10, 0, 1),
    ("M3500", 50, 0, 1),
    ("M3500", 100, 0, 1),
    ("sphere2500", 0, 0, 1),
    ("sphere2500", 50, 0, 1),
]

METHOD_NAME = {0: "baseline", 1: "dcs"}


def key_of(ds, n, seed):
    return f"{ds}_{n}out_seed{seed}"


def main(only: list[str]) -> None:
    import numpy as np

    from slam_tpu.config import RunConfig, SolverConfig
    from slam_tpu.io import g2o
    from slam_tpu.methods.global_solve import run_global_solve
    from slam_tpu.utils.logging import RunLogger

    os.makedirs(GOLDEN, exist_ok=True)
    os.makedirs(REPLAY, exist_ok=True)
    meta_path = os.path.join(GOLDEN, "meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    for ds, n, seed, method in CONFIGS:
        key = key_of(ds, n, seed)
        if only and key not in only:
            continue
        graph = g2o.load_g2o(g2o.find_dataset(ds))
        dirty = graph.add_random_outliers(n, seed=seed)
        if n > 0:
            g2o.write_g2o(os.path.join(REPLAY, f"{key}.g2o"), dirty)
        cfg = RunConfig(
            dataset=ds, num_outliers=n, seed=seed, method=method,
            solver=SolverConfig(dtype="float64", max_iterations=100),
        )
        out = run_global_solve(dirty, cfg, RunLogger(echo=False))
        np.save(os.path.join(GOLDEN, f"{key}.npy"), out.poses)
        meta[key] = {
            "initial_cost": float(out.result.initial_cost),
            "final_cost": float(out.result.cost),
            "iterations": int(out.result.iterations),
            "method": METHOD_NAME[method],
            "solver": "product defaults (auto init/linear), f64 cpu, "
                      "100 iters",
        }
        print(f"{key}: {meta[key]}", flush=True)
        json.dump(meta, open(meta_path, "w"), indent=2)
    print("golden + replay regenerated")


if __name__ == "__main__":
    main(sys.argv[1:])
