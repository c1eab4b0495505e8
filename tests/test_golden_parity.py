"""Golden AUC-parity tests (SURVEY.md §4 tier 4).

Real Avazu/Criteo raw data is not obtainable offline, so the parity contract
(BASELINE.md "paper AUC +-0.0005") is validated the strongest way available:
the TORCH REFERENCE ITSELF (/root/reference, CPU) and map_tpu are run on
byte-identical 400k-row synthetic-Avazu artifacts (validation/gen_data.py,
seed 7) and their final metrics compared. These tests read the run artifacts
under validation/runs/ and SKIP when absent (they are produced by
validation/run_reference.sh + run_tpu.sh, ~30 min total); CI-fast structural
equivalents live in test_train_e2e.py.

Tolerances are set from the MEASURED multi-seed noise band (seeds 42-45,
validation/run_seed_sweep.sh, aggregated by validation/seed_stats.py): the
two frameworks share data but not RNG streams (init order, shuffle,
corruption draws differ by design), and the single-run cross-framework diff
std is sqrt(s_ref^2 + s_tpu^2) per stage — AUC ~1.4e-3 (so the 4e-3 bound
is ~3 sigma, ratified rather than loose), MFP acc ~4.6e-3, RFD acc ~2.4e-3.
Each bound below is ~3 sigma of that measured band. The statistically tight
certification (delta of MEANS inside 2 standard errors + the 5e-4 parity
budget) lives in test_multiseed_parity.py; these single-seed tests are the
per-run drift alarm. Reference-side absolute pins guard against silent
dataset drift.
"""

import os

import pytest

BASE = os.path.join(os.path.dirname(__file__), "..", "validation")


def _metrics(stage: str, which: str):
    import re

    path = os.path.join(BASE, "runs", which, stage, "train.log")
    if not os.path.exists(path):
        pytest.skip(f"validation artifact missing: {path}")
    out = {}
    for key in ("eval_auc", "eval_loss", "eval_mfp_acc", "eval_mfp_loss",
                "eval_rfd_acc", "eval_rfd_loss"):
        pat = re.compile(rf"'{key}': (?:np\.float64\()?([0-9.eE+-]+)\)?")
        vals = [float(m.group(1)) for m in pat.finditer(
            open(path, errors="ignore").read())]
        if vals:
            out[key] = vals
    return out


def _tpu_dir():
    """Prefer the tag with the most completed stages (a fresh chip run may
    exist but be mid-flight; the CPU-backend numerics are backend-faithful —
    validation/README.md TPU-chip confirmation)."""
    stages = ("scratch", "mfp", "rfd", "finetune", "finetune_rfd")
    best, best_n = None, 0
    for tag in ("tpu", "tpu_cpu"):
        n = sum(os.path.exists(os.path.join(BASE, "runs", tag, s,
                                            "results.log")) for s in stages)
        if n > best_n:
            best, best_n = tag, n
    if best is None:
        pytest.skip("no map_tpu validation runs present")
    return best


@pytest.mark.parametrize("stage", ["scratch", "finetune", "finetune_rfd"])
def test_supervised_auc_parity(stage):
    ref = _metrics(stage, "reference")
    got = _metrics(stage, _tpu_dir())
    if "eval_auc" not in got:
        pytest.skip(f"map_tpu {stage} not finished")
    # last eval_auc entry = the TEST block of the best checkpoint
    d_auc = got["eval_auc"][-1] - ref["eval_auc"][-1]
    d_ll = got["eval_loss"][-1] - ref["eval_loss"][-1]
    assert abs(d_auc) < 4e-3, (stage, got["eval_auc"][-1], ref["eval_auc"][-1])
    assert abs(d_ll) < 4e-3, (stage, got["eval_loss"][-1], ref["eval_loss"][-1])


def test_mfp_pretrain_parity():
    ref = _metrics("mfp", "reference")
    got = _metrics("mfp", _tpu_dir())
    if "eval_mfp_acc" not in got:
        pytest.skip("map_tpu mfp not finished")
    assert abs(got["eval_mfp_acc"][-1] - ref["eval_mfp_acc"][-1]) < 1.5e-2
    assert abs(got["eval_mfp_loss"][-1] - ref["eval_mfp_loss"][-1]) < 3.5e-2


def test_rfd_pretrain_parity():
    ref = _metrics("rfd", "reference")
    got = _metrics("rfd", _tpu_dir())
    if "eval_rfd_acc" not in got:
        pytest.skip("map_tpu rfd not finished")
    assert abs(got["eval_rfd_acc"][-1] - ref["eval_rfd_acc"][-1]) < 8e-3
    assert abs(got["eval_rfd_loss"][-1] - ref["eval_rfd_loss"][-1]) < 2e-2


def test_reference_absolute_pins():
    """Guard against silent regeneration of the shared dataset: the torch
    reference's metrics on the seed-7 400k-row artifacts are fixed."""
    ref = _metrics("scratch", "reference")
    assert abs(ref["eval_auc"][-1] - 0.747920) < 1e-3
    assert abs(ref["eval_loss"][-1] - 0.398756) < 1e-3


def test_finetune_beats_or_matches_scratch():
    """The reference's headline claim (pretrain -> finetune >= scratch) holds
    for map_tpu on the shared data (small data: allow a tiny regression)."""
    t = _tpu_dir()
    scratch = _metrics("scratch", t)
    ft = _metrics("finetune", t)
    if "eval_auc" not in ft:
        pytest.skip("map_tpu finetune not finished")
    assert ft["eval_auc"][-1] >= scratch["eval_auc"][-1] - 2e-3
