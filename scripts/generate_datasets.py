#!/usr/bin/env python
"""Generate the datasets the reference names but does not ship.

``main.cpp:23`` lists M10000 (stripped from the reference checkout, see
``.MISSING_LARGE_BLOBS``) and the BASELINE.json configs require
sphere2500-class SE(3) graphs.  Both are produced synthetically with known
ground truth (slam_tpu/io/synthetic.py) and written in standard g2o format
to ``data/``, alongside a small smoke-test graph.

Usage: python scripts/generate_datasets.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from slam_tpu.io import g2o, synthetic  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "data"
    )
    os.makedirs(outdir, exist_ok=True)

    print("generating sphere2500 (SE3)...")
    graph, gt = synthetic.sphere_se3(n=2500, rings=50, seed=0)
    g2o.write_g2o(os.path.join(outdir, "sphere2500.g2o"), graph)
    np.save(os.path.join(outdir, "sphere2500_gt.npy"), gt)

    print("generating M10000 (Manhattan SE2)...")
    # Rotational noise scaled down vs the small-graph default: over 10k
    # integration steps 0.02 rad/step produces a useless initial guess
    # (hundreds of meters of drift) that no robust method could recover --
    # real M3500-class datasets start from moderately drifted but sane
    # odometry.
    graph, gt = synthetic.manhattan_se2(
        n=10000, max_closures=6000, odo_noise=(0.03, 0.003), seed=0
    )
    g2o.write_g2o(os.path.join(outdir, "M10000.g2o"), graph)
    np.save(os.path.join(outdir, "M10000_gt.npy"), gt)

    print("done:", sorted(os.listdir(outdir)))


if __name__ == "__main__":
    main()
