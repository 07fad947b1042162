"""Per-layer ATE table for the method-3/4 layer managers (VERDICT r4
task 6: explain the selection quality).

The sweeps report only the SELECTED layer's ATE (min-EMA rule for method
3, ``layer_manager.cpp:556-562``; normalized-reward for method 4,
``simple_layer_manager.cpp:643-668``).  A bad number there is ambiguous:
either the *layering* failed (every layer is bad) or the *selection rule*
failed (a good layer exists and the rule misses it).  This script runs
the production manager, computes ATE vs the clean solve for EVERY layer,
and classifies the outcome.

Writes ``results/layer_tables/<DS>_<N>out_s<SEED>_m<M>.json`` and prints
the table.

Usage: python scripts/method_layer_table.py DATASET N_OUT SEED METHOD
       (METHOD in {3, 4})
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = os.path.join(os.path.dirname(__file__), "..", "results",
                      "layer_tables")


def main() -> int:
    from slam_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    dataset, n_out, seed, method = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

    from slam_tpu.config import RunConfig
    from slam_tpu.eval import metrics
    from slam_tpu.io import g2o
    from slam_tpu.methods.global_solve import run_global_solve
    from slam_tpu.utils.logging import RunLogger

    graph = g2o.load_g2o(g2o.find_dataset(dataset))
    clean = run_global_solve(
        graph, RunConfig(dataset=dataset, method=0, num_outliers=0),
        RunLogger(echo=False))
    clean_poses = clean.poses

    dirty = graph.add_random_outliers(n_out, seed=seed)
    cfg = RunConfig(dataset=dataset, method=method, num_outliers=n_out,
                    seed=seed)
    # Same init policy as the CLI pipeline (run_from_config): the
    # published selection rows ride `--init auto` (chordal on the
    # M3500 family, dataset init on INTEL/CSAIL/MIT).
    from slam_tpu.solver.init import apply_init
    from slam_tpu.utils.logging import RunLogger as _RL
    dirty = apply_init(dirty, cfg, _RL(echo=False))

    rows = []
    if method == 3:
        from slam_tpu.methods.layering import make_manager
        mgr = make_manager(dirty, cfg, RunLogger(echo=False))
        out = mgr.run()
        for k in range(1, len(out.layers)):
            lay = out.layers[k]
            rows.append(dict(
                layer=k,
                ate=float(metrics.ate(lay.poses, clean_poses)),
                ema_residual=float(lay.ema_residual),
                edges=int(lay.mask.sum()),
                visits=float(lay.visits),
                selected=(k == out.best_layer),
            ))
        selected = out.best_layer
    elif method == 4:
        from slam_tpu.methods.mcts import make_manager
        mgr = make_manager(dirty, cfg, RunLogger(echo=False))
        out = mgr.run()
        for lid, lay in out.layers.items():
            nrm = (lay.total_reward
                   / np.sqrt(1.0 + int(np.sum(lay.all_edges))))
            rows.append(dict(
                layer=lid,
                ate=float(metrics.ate(lay.poses, clean_poses)),
                normalized_reward=float(nrm),
                edges=int(np.sum(lay.all_edges)),
                visits=int(lay.visits),
                selected=(lid == out.best_layer),
            ))
        selected = out.best_layer
    else:
        raise SystemExit("METHOD must be 3 or 4")

    best_ate_row = min(rows, key=lambda r: r["ate"])
    sel_row = next(r for r in rows if r["selected"])
    # Selection failure = a layer at least 2x better (and >0.5 m better)
    # than the selected one exists.
    selection_failure = (
        best_ate_row["ate"] < 0.5 * sel_row["ate"]
        and sel_row["ate"] - best_ate_row["ate"] > 0.5)
    layering_failure = best_ate_row["ate"] > 1.0

    rec = dict(
        dataset=dataset, num_outliers=n_out, seed=seed, method=method,
        selected_layer=str(selected),
        selected_ate=sel_row["ate"],
        best_layer_by_ate=str(best_ate_row["layer"]),
        best_ate=best_ate_row["ate"],
        selection_failure=bool(selection_failure),
        layering_failure=bool(layering_failure),
        diagnosis=(
            "selection failure: a good layer exists and the rule missed it"
            if selection_failure else
            "layering failure: no good layer exists"
            if layering_failure else
            "selection ok"),
        layers=rows,
    )

    os.makedirs(OUTDIR, exist_ok=True)
    path = os.path.join(
        OUTDIR, f"{dataset}_{n_out}out_s{seed}_m{method}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)

    print(f"\n{dataset}+{n_out} seed {seed} method {method}: "
          f"selected={selected} (ATE {sel_row['ate']:.3f} m), "
          f"best-by-ATE={best_ate_row['layer']} "
          f"(ATE {best_ate_row['ate']:.3f} m) -> {rec['diagnosis']}")
    for r in sorted(rows, key=lambda r: r["ate"]):
        mark = " <- selected" if r["selected"] else ""
        print("  " + json.dumps(r) + mark)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
