"""Unit tests for the stall-supervisor's log parsing (scripts/supervise_walk.py).

The supervisor is the framework's external failure-recovery layer for the
flaky-tunnel runtime (round-5 operational finding: the RPC stream drops
roughly hourly, wedging the training process in a futex wait).  Its
adoption decisions — which checkpoint to warm-start the retry from, and
whether a killed attempt's best eval beat everything shipped — are driven
entirely by ``parse_attempt``, so that parser gets direct coverage here.
Reference analog: the in-loop NaN-reset recovery upstream
(training/sci_equilibrium_training.py) has no external supervisor; this
layer is new, demanded by the target runtime.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "supervise_walk", os.path.join(REPO, "scripts", "supervise_walk.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_attempt_ema_and_best(tmp_path):
    sw = _load()
    log = tmp_path / "a.log"
    log.write_text(
        "step 100 loss 0.01\n"
        "EMA eval: 31.90 dB (raw 31.72)\n"
        "EMA eval: 32.01 dB (raw 31.85)\n"
        "best eval (at 180 iters): 32.01 dB\n")
    best, consol = sw.parse_attempt(str(log))
    assert best == 32.01
    assert consol is None  # nothing consolidated -> nothing shipped


def test_parse_attempt_consolidation_with_score(tmp_path):
    sw = _load()
    log = tmp_path / "b.log"
    log.write_text(
        "EMA eval: 31.50 dB (raw 31.40)\n"
        "consolidated models/ffdnet_clean at 32.01 dB\n")
    best, consol = sw.parse_attempt(str(log))
    assert consol == 32.01
    assert best >= 31.50


def test_parse_attempt_saved_without_score_falls_back_to_best(tmp_path):
    # extend_admm prints 'saved models/X' with no score; the consolidated
    # value must then fall back to the best eval seen in the same log.
    sw = _load()
    log = tmp_path / "c.log"
    log.write_text(
        "EMA eval: 31.62 dB (raw 31.55)\n"
        "saved models/admm_ffdnet_r5\n")
    best, consol = sw.parse_attempt(str(log))
    assert best == 31.62
    assert consol == 31.62


def test_parse_attempt_empty_or_missing(tmp_path):
    sw = _load()
    best, consol = sw.parse_attempt(str(tmp_path / "missing.log"))
    assert best == float("-inf") and consol is None
    empty = tmp_path / "d.log"
    empty.write_text("no eval lines at all\n")
    best, consol = sw.parse_attempt(str(empty))
    assert best == float("-inf") and consol is None
