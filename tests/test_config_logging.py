"""Config mapping and logger formatting tests."""

import re

from slam_tpu.config import (
    METHOD_BASELINE,
    METHOD_DCS,
    METHOD_LAYERING,
    METHOD_MCTS,
    METHOD_SC,
    SolverConfig,
    solver_config_for_method,
)
from slam_tpu.utils.logging import RunLogger


def test_method_to_robust_mapping():
    """CLI method ids map to robust modes exactly as ``main.cpp:54-56``."""
    assert solver_config_for_method(METHOD_BASELINE).robust == "none"
    assert solver_config_for_method(METHOD_DCS).robust == "dcs"
    assert solver_config_for_method(METHOD_SC).robust == "sc"
    # Methods 3/4 drive their own managers; the global config stays plain.
    assert solver_config_for_method(METHOD_LAYERING).robust == "none"
    assert solver_config_for_method(METHOD_MCTS).robust == "none"


def test_reference_constants_as_defaults():
    cfg = SolverConfig()
    assert cfg.dcs_phi == 0.5            # ceres_error.cpp:185
    assert cfg.huber_delta == 0.01       # main.cpp:68
    assert cfg.sc_prior_lambda == 1.0    # main.cpp:107
    assert cfg.max_iterations == 50      # Ceres default


def test_solver_config_hashable_and_replace():
    cfg = SolverConfig()
    assert hash(cfg) == hash(SolverConfig())
    cfg2 = cfg.replace(dcs_phi=1.0)
    assert cfg2.dcs_phi == 1.0 and cfg.dcs_phi == 0.5
    assert hash(cfg2) != hash(cfg)


def test_run_logger_dual_sink(tmp_path, capsys):
    path = tmp_path / "run.log"
    with RunLogger(str(path)) as log:
        log.log("solve", cost=1.23456789, iters=7)
        log.log("note", "free text", flag=True)
    out = capsys.readouterr().out
    text = path.read_text()
    for sink in (out, text):
        assert "[solve] cost=1.234568 iters=7" in sink
        assert "[note] free text flag=True" in sink
    # Tagged-line format is grep-able: every line starts with [tag].
    assert all(re.match(r"^\[\w+\]", line) for line in text.splitlines())
