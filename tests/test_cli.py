"""CLI argument-surface tests (the reference interface, main.cpp:25-31)."""

import pytest

from slam_tpu.cli import build_parser, config_from_args


def test_positional_surface_matches_reference():
    args = build_parser().parse_args(["INTEL", "50", "1"])
    cfg = config_from_args(args)
    assert cfg.dataset == "INTEL"
    assert cfg.num_outliers == 50
    assert cfg.method == 1
    # Reference defaults surface as config defaults.
    assert cfg.solver.dcs_phi == 0.5
    assert cfg.solver.huber_delta == 0.01
    assert cfg.solver.sc_prior_lambda == 1.0
    assert cfg.solver.max_iterations == 50


def test_flag_overrides():
    args = build_parser().parse_args(
        ["M3500", "10", "2", "--dcs-phi", "1.5", "--huber-delta", "0.1",
         "--linear-solver", "pcg", "--seed", "7"]
    )
    cfg = config_from_args(args)
    assert cfg.solver.dcs_phi == 1.5
    assert cfg.solver.huber_delta == 0.1
    assert cfg.solver.linear_solver == "pcg"
    assert cfg.seed == 7


def test_fused_eval_flag_overrides():
    args = build_parser().parse_args(
        ["INTEL", "5", "3", "--scan-chunk", "16", "--eval-linear", "schur",
         "--eval-pcg-iters", "16", "--eval-pcg-rtol", "1e-2"]
    )
    cfg = config_from_args(args)
    for sub in (cfg.layering, cfg.mcts):
        assert sub.scan_chunk == 16
        assert sub.eval_linear == "schur"
        assert sub.eval_pcg_max_iters == 16
        assert sub.eval_pcg_rtol == 1e-2


def test_invalid_method_rejected():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["INTEL", "5", "9"])
