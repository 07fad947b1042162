"""Record Ceres-oracle vs production-solver identity at dataset scale.

VERDICT r3 "missing #2": external ``ate_vs_reference`` has been null for
three rounds because Ceres is not installable here.  The oracle
(`solver/ceres_oracle.py`) reimplements the reference's exact algorithm
(stock Ceres LM + Triggs-corrected Huber + the ceres_error.cpp residuals)
independently of the production solver; this script runs both from the
SAME init on the reference's own datasets and records

* the oracle's FullReport numbers (initial/final cost, iterations,
  termination),
* the production plain solve's final map re-priced under the oracle's
  exact objective (cost identity), and
* ATE between the two final maps (basin identity).

Writes ``results/ceres_oracle.json``.  CPU-only (the oracle is NumPy; the
production side is forced to the CPU backend in f64).

Usage: python scripts/ceres_oracle_check.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

CELLS = [
    # dataset, outliers, seed, method
    ("INTEL", 0, 0, 0),
    ("INTEL", 0, 0, 1),
    ("INTEL", 50, 42, 1),
    ("CSAIL", 0, 0, 1),
    ("CSAIL", 50, 0, 1),
    ("M3500", 0, 0, 1),
    ("M3500", 10, 0, 1),
    ("INTEL", 50, 42, 2),
    # MIT: the modeling-limit dataset (results/mit_battery.json).  The
    # oracle IS the reference's algorithm, so its collapse here turns
    # "any Ceres-DCS shares the trap" from inference into measurement.
    ("MIT", 0, 0, 1),
]


def run_cell(dataset, n_out, seed, method):
    import jax.numpy as jnp

    from slam_tpu.config import SolverConfig, solver_config_for_method
    from slam_tpu.eval import metrics
    from slam_tpu.io import g2o
    from slam_tpu.solver import ceres_oracle as co
    from slam_tpu.solver.lm import lm_solve
    from slam_tpu.solver.problem import anchor_first_node, edge_set_from_graph

    g = g2o.load_g2o(g2o.find_dataset(dataset))
    if n_out:
        g = g.add_random_outliers(n_out, seed=seed)
    g = g.canonical_order()
    poses0 = np.asarray(g.poses)
    ij = np.asarray(g.edges_ij)
    meas = np.asarray(g.edges_meas)
    et = np.asarray(g.edge_type)

    t0 = time.perf_counter()
    rep = co.ceres_solve(poses0, ij, meas, et, method=method)
    oracle_wall = time.perf_counter() - t0

    edges = edge_set_from_graph(g, dtype=jnp.float64)
    free = anchor_first_node(g.num_nodes, dtype=jnp.float64)
    sw0 = jnp.ones((edges.num_edges,), jnp.float64)
    partition = None
    if g.num_nodes < 2500:
        scfg = solver_config_for_method(
            method, SolverConfig(linear_solver="dense", dtype="float64"))
    else:
        from slam_tpu.solver.schur import build_partition, choose_num_blocks
        scfg = solver_config_for_method(
            method, SolverConfig(linear_solver="schur", dtype="float64"))
        nblocks = choose_num_blocks(np.asarray(edges.ij), g.num_nodes,
                                    tangent_dim=3)
        partition = build_partition(np.asarray(edges.ij), g.num_nodes,
                                    nblocks, dtype=jnp.float64)
    ours = lm_solve(jnp.asarray(poses0), sw0, edges, free, scfg,
                    partition=partition)
    ours_poses = np.asarray(ours.poses)
    ours_sw = None
    if method == 2:
        ours_sw = np.asarray(ours.switches)[np.where(et != 0)[0]]

    ours_cost_oracle_objective = co.ceres_cost(
        ours_poses, ij, meas, et, method=method, switches=ours_sw)
    return {
        "dataset": dataset, "outliers": n_out, "seed": seed,
        "method": method,
        "oracle_initial_cost": rep.initial_cost,
        "oracle_final_cost": rep.final_cost,
        "oracle_iterations": rep.iterations,
        "oracle_successful_steps": rep.successful_steps,
        "oracle_termination": rep.termination,
        "oracle_wall_s": round(oracle_wall, 2),
        "ours_final_cost_under_oracle_objective":
            ours_cost_oracle_objective,
        "cost_rel_gap": abs(rep.final_cost - ours_cost_oracle_objective)
            / max(rep.final_cost, 1e-12),
        "ate_ours_vs_oracle_m": float(metrics.ate(ours_poses, rep.poses)),
    }


def main():
    quick = "--quick" in sys.argv
    cells = CELLS[:3] if quick else CELLS
    rows = []
    for c in cells:
        print(f"[cell] {c} ...", flush=True)
        row = run_cell(*c)
        print("   ", json.dumps(
            {k: (round(v, 6) if isinstance(v, float) else v)
             for k, v in row.items()}), flush=True)
        rows.append(row)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "ceres_oracle.json")
    with open(out, "w") as f:
        json.dump({"cells": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
