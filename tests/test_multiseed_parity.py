"""Multi-seed AUC-parity certification (VERDICT round-2 item 2).

The round-2 single-seed deltas (~-1e-3 AUC, 4 of 5 stages negative) were
attributed to seed noise without a measured noise band. The seed sweep
(validation/run_seed_sweep.sh: torch reference AND map_tpu at seeds
42/43/44/45 on the shared 400k artifacts) establishes that band, and these
tests assert the delta-of-means is statistically compatible with zero:

    |mean_tpu - mean_ref| <= 2 * sqrt(s_ref^2/n_ref + s_tpu^2/n_tpu) + eps

(eps = 5e-4, the BASELINE.md parity budget — a true framework divergence
smaller than the paper-parity budget is acceptable by contract). Skips when
fewer than 2 seeds per side have finished."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "validation"))

EPS = 5e-4


def _collect():
    import seed_stats

    return seed_stats.collect("tpu_cpu")


def _band(stage, idx):
    import seed_stats

    data = _collect()[stage]
    if len(data["ref"]) < 2 or len(data["tpu"]) < 2:
        pytest.skip(f"{stage}: need >=2 finished seeds per side "
                    f"(have ref={len(data['ref'])}, tpu={len(data['tpu'])})")
    rmu, rsd = seed_stats.mean_std([v[idx] for v in data["ref"]])
    tmu, tsd = seed_stats.mean_std([v[idx] for v in data["tpu"]])
    se = math.sqrt(rsd ** 2 / len(data["ref"]) + tsd ** 2 / len(data["tpu"]))
    return tmu - rmu, 2 * se


@pytest.mark.parametrize("stage", ["scratch", "finetune", "finetune_rfd"])
def test_supervised_auc_mean_parity(stage):
    delta, band = _band(stage, 0)
    assert abs(delta) <= band + EPS, (stage, delta, band)


@pytest.mark.parametrize("stage", ["mfp", "rfd"])
def test_pretrain_acc_mean_parity(stage):
    delta, band = _band(stage, 0)
    # acc is a coarser metric than AUC (3-epoch pretrain on 400k rows);
    # allow 2x the AUC eps on top of the measured band
    assert abs(delta) <= band + 2 * EPS, (stage, delta, band)


@pytest.mark.parametrize("stage", ["scratch", "finetune", "finetune_rfd"])
def test_supervised_logloss_mean_parity(stage):
    delta, band = _band(stage, 1)
    assert abs(delta) <= band + EPS, (stage, delta, band)
