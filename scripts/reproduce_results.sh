#!/bin/bash
# Reproduces every table in results/ on the current hardware.
# Runtimes assume a warm XLA compilation cache (~/.cache/slam_tpu_xla);
# first-ever runs add minutes of compile per new program shape.
set -e
cd "$(dirname "$0")/.."

echo "== datasets (generates sphere2500 + M10000 into data/)"
python scripts/generate_datasets.py

echo "== headline bench (results/README.md throughput table)"
python bench.py

echo "== scale/solver comparisons (results/README.md scale notes)"
python scripts/bench_m10000.py schur:8 pcg:16        # M10000 solver A/B
python scripts/bench_m10000.py schur:8 schurgnc:8 --init-chordal  # init/GNC quality
python scripts/bench_pcg.py                          # INTEL+50 PCG vs Schur
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python scripts/dist_scale_check.py 5               # distributed Schur @ M3500

echo "== chordal/GNC quality experiments (results/README.md)"
python scripts/bench_m3500bc.py --init-chordal       # M3500b/c variants
python scripts/gnc_sphere_ab.py 0:1:30 0:1:30:chordal  # structured-sphere

echo "== bench stage profile (results/README.md fourth-pass section)"
python scripts/profile_bench.py
python scripts/profile_schur_stages.py

echo "== INTEL robustness grid (results/intel_sweep_r1.md)"
python -m slam_tpu.cli INTEL 100 1 --sweep --save-path save/intel_sweep

echo "== multi-dataset sweeps (results/sweeps/)"
for ds in CSAIL MIT FR079 FRH M3500; do
  python - <<PY
from slam_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from slam_tpu.eval import harness
from slam_tpu.config import SolverConfig
from slam_tpu.utils.logging import RunLogger
harness.run_sweep("$ds", methods=[0,1], outlier_counts=[0,50], seeds=[0],
                  solver=SolverConfig(dtype="float32"),
                  save_path="save/sweeps/$ds", logger=RunLogger(echo=False))
PY
done

echo "== methods 3/4 on INTEL+50"
python -m slam_tpu.cli INTEL 50 3 --save-path save/m3 --seed 42
python -m slam_tpu.cli INTEL 50 4 --save-path save/m4 --seed 42

echo "== Ceres-semantics oracle identity (results/ceres_oracle.json; CPU f64)"
python scripts/ceres_oracle_check.py

echo "== manager-oracle decision parity (results/manager_oracle.json; r5)"
python scripts/manager_oracle_check.py slice
python -m slam_tpu.cli INTEL 50 3 --save-path save/mo_m3 --seed 42
python -m slam_tpu.cli INTEL 50 4 --save-path save/mo_m4 --seed 42
python scripts/manager_oracle_check.py intel50 \
  --m3-log=save/mo_m3/method3.log --m4-log=save/mo_m4/method4.log
python -m slam_tpu.cli CSAIL 50 3 --save-path save/mo_c3 --seed 0
python -m slam_tpu.cli CSAIL 50 4 --save-path save/mo_c4 --seed 0
python scripts/manager_oracle_check.py csail50 \
  --m3-log=save/mo_c3/method3.log --m4-log=save/mo_c4/method4.log

echo "== per-layer ATE tables (results/layer_tables/; r5)"
python scripts/method_layer_table.py INTEL 50 42 3
python scripts/method_layer_table.py INTEL 50 42 4
python scripts/method_layer_table.py M3500 50 0 3
python scripts/method_layer_table.py M3500 50 0 4

echo "== unfused-linearize cost bounds (results/ROUND5.md section 3; r5)"
python scripts/linearize_cost.py

echo "== Pallas micro-Cholesky in-context A/B (results/ROUND5.md section 2; r5)"
python scripts/bench_variants.py blocked=1 panel=128 pallas=0
python scripts/bench_variants.py blocked=1 panel=32 pallas=1
python scripts/bench_variants.py blocked=1 panel=32 pallas=0

echo "== spectral-partition measurements (results/ROUND5.md section 7; r5)"
python scripts/bench_m10000.py schur:24 schurgraph:16 schurgraph:24 \
  schurgraph:32 schurgraph:48            # scheme sweep (14.77 vs 24-32 it/s)
python scripts/bench_m10000.py schurgraph:32 --chunk 30   # dispatch negative
python scripts/profile_schur_stages.py --dataset M10000 --batch 1 \
  --blocks 32 --scheme graph             # post-partition stage table
timeout 2500 python -m slam_tpu.cli M3500 50 3 --save-path save/m3_wall \
  --seed 0                               # 6m51s-warm method-3 wall record

echo "== one-core CPU anchors (results/cpu_baseline.json; r5 panel)"
python scripts/bench_cpu_baseline.py intel m10000 sphere

echo "== MIT modeling-limit battery (results/mit_battery.json; CPU f64)"
python scripts/mit_battery.py

echo "== multi-seed sweep regeneration (results/sweeps/, seeds 0/1/42)"
python scripts/run_sweeps.py

echo "== golden trajectories (CPU f64; used by tests/test_golden.py)"
JAX_PLATFORMS=cpu python - <<'PY'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
# see results/golden/meta.json for the recorded costs
print("golden regeneration: see session scripts; committed goldens are canonical")
PY
echo "done; outputs under save/"
