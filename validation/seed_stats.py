"""Aggregate the multi-seed parity sweep (run_seed_sweep.sh) into per-stage
mean +- std for the torch reference and map_tpu, plus the delta-of-means and
a 2-sigma significance verdict. Markdown table on stdout; also importable
(collect()) by tests/test_multiseed_parity.py.

Stage metric = the same scalar compare.py uses: supervised stages -> final
TEST AUC (and logloss); mfp/rfd -> final eval acc (and loss)."""

from __future__ import annotations

import math
import os
import re
import sys

BASE = os.path.dirname(os.path.abspath(__file__))
STAGES = ("scratch", "mfp", "rfd", "finetune", "finetune_rfd")
SEEDS = (42, 43, 44, 45, 46, 47, 48, 49)  # 46-49: mfp-stage-only
# (run_mfp_seed_sweep.sh, VERDICT round-4 item 7 — other stages stay n=4)


def _last(path: str, key: str):
    if not os.path.exists(path):
        return None
    pat = re.compile(rf"'{key}': (?:np\.float64\()?([0-9.eE+-]+)\)?")
    vals = [float(m.group(1)) for m in pat.finditer(
        open(path, errors="ignore").read())]
    return vals[-1] if vals else None


def _stage_metrics(run_dir: str, stage: str):
    log = os.path.join(run_dir, stage, "train.log")
    if stage in ("mfp", "rfd"):
        return (_last(log, f"eval_{stage}_acc"), _last(log, f"eval_{stage}_loss"))
    return (_last(log, "eval_auc"), _last(log, "eval_loss"))


def _run_dir(which: str, seed: int) -> str:
    d = os.path.join(BASE, "runs", which)
    return d if seed == 42 else f"{d}_s{seed}"


def collect(tpu_tag: str = "tpu_cpu"):
    """{stage: {"ref": [(auc, loss) per seed], "tpu": [...]}} — only seeds
    whose runs finished (results.log present) are included."""
    out = {}
    for stage in STAGES:
        ref, tpu = [], []
        for seed in SEEDS:
            for which, acc in (("reference", ref), (tpu_tag, tpu)):
                d = _run_dir(which, seed)
                if os.path.exists(os.path.join(d, stage, "results.log")):
                    m = _stage_metrics(d, stage)
                    if m[0] is not None:
                        acc.append(m)
        out[stage] = {"ref": ref, "tpu": tpu}
    return out


def mean_std(vals):
    n = len(vals)
    mu = sum(vals) / n
    if n < 2:
        return mu, 0.0
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    return mu, math.sqrt(var)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "tpu_cpu"
    data = collect(tag)
    print("| stage | metric | reference mean±std (n) | map_tpu mean±std (n) |"
          " Δmean | 2σ(Δ) | verdict |")
    print("|---|---|---|---|---|---|---|")
    for stage in STAGES:
        d = data[stage]
        if not d["ref"] or not d["tpu"]:
            print(f"| {stage} | - | missing runs | | | | |")
            continue
        name = "acc" if stage in ("mfp", "rfd") else "test auc"
        for i, mname in enumerate((name, "loss")):
            rmu, rsd = mean_std([v[i] for v in d["ref"]])
            tmu, tsd = mean_std([v[i] for v in d["tpu"]])
            nr, nt = len(d["ref"]), len(d["tpu"])
            delta = tmu - rmu
            se = math.sqrt(rsd ** 2 / nr + tsd ** 2 / nt)
            verdict = ("within noise" if abs(delta) <= 2 * se + 1e-12
                       else "SIGNIFICANT")
            print(f"| {stage} | {mname} | {rmu:.6f}±{rsd:.6f} ({nr}) | "
                  f"{tmu:.6f}±{tsd:.6f} ({nt}) | {delta:+.6f} | "
                  f"{2 * se:.6f} | {verdict} |")


if __name__ == "__main__":
    main()
