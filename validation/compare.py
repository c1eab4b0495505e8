"""Collect AUC/LogLoss from reference and map_tpu validation runs into one
parity table (printed as markdown; paste into validation/README.md)."""

from __future__ import annotations

import os
import re
import sys

BASE = os.path.dirname(os.path.abspath(__file__))


def last_metric(log_path: str, key: str):
    if not os.path.exists(log_path):
        return None
    vals = []
    pat = re.compile(rf"'{key}': (?:np\.float64\()?([0-9.eE+-]+)\)?")
    for line in open(log_path, errors="ignore"):
        m = pat.search(line)
        if m:
            vals.append(float(m.group(1)))
    return vals


def summarize(run_dir: str):
    log = os.path.join(run_dir, "train.log")
    out = {}
    for key in ("eval_auc", "eval_loss", "eval_mfp_acc", "eval_mfp_loss",
                "eval_rfd_acc", "eval_rfd_loss"):
        vals = last_metric(log, key)
        if vals:
            out[key] = vals
    return out


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else ""
    tpu_dir = f"tpu_{tag}" if tag else "tpu"
    stages = ("scratch", "mfp", "rfd", "finetune", "finetune_rfd")
    rows = []
    for stage in stages:
        ref = summarize(os.path.join(BASE, "runs", "reference", stage))
        tpu = summarize(os.path.join(BASE, "runs", tpu_dir, stage))
        if stage in ("mfp", "rfd"):
            k_acc = f"eval_{stage}_acc"
            k_loss = f"eval_{stage}_loss"
            rows.append((stage,
                         ref.get(k_acc, ["-"])[-1], tpu.get(k_acc, ["-"])[-1],
                         ref.get(k_loss, ["-"])[-1], tpu.get(k_loss, ["-"])[-1],
                         "acc/loss"))
        else:
            # supervised logs: last two eval_auc entries are [best-valid, test]
            r_auc = ref.get("eval_auc", ["-"])
            t_auc = tpu.get("eval_auc", ["-"])
            r_ll = ref.get("eval_loss", ["-"])
            t_ll = tpu.get("eval_loss", ["-"])
            rows.append((stage, r_auc[-1], t_auc[-1], r_ll[-1], t_ll[-1],
                         "test auc/logloss"))

    print(f"| stage | reference | map_tpu{('_' + tag) if tag else ''} | delta |"
          f" metric |")
    print("|---|---|---|---|---|")
    for stage, r, t, rl, tl, kind in rows:
        d = (f"{t - r:+.6f}" if isinstance(r, float) and isinstance(t, float)
             else "-")
        fmt = lambda x: f"{x:.6f}" if isinstance(x, float) else x  # noqa: E731
        print(f"| {stage} | {fmt(r)} | {fmt(t)} | {d} | {kind} |")
        if isinstance(rl, float) or isinstance(tl, float):
            dl = (f"{tl - rl:+.6f}" if isinstance(rl, float)
                  and isinstance(tl, float) else "-")
            print(f"| {stage} (loss) | {fmt(rl)} | {fmt(tl)} | {dl} | |")


if __name__ == "__main__":
    main()
