"""Synthetic raw-Criteo generator for the x4-scale production proof
(VERDICT round-4 item 3): emits a dac-format TSV (label \\t I1..I13 \\t
C1..C26) with Criteo-like shape — 13 numeric fields with NaN holes, 26
categorical fields whose cardinalities span 10..~2M with Zipf-ish skew, so
the post-10-core field-blocked vocabulary lands at >= 4M ids over ~40M rows.
Labels carry cross-field logistic signal so training has learnable AUC.

Chunked + vectorized: ~40M rows in minutes, peak RAM ~ one chunk.

Usage: python benchmarks/criteo_proof/gen_raw.py --out /data/dac.txt \
           --rows 40000000 [--seed 17]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import pandas as pd

# per-categorical-field Zipf head sizes (draws beyond the head fall in a
# huge uniform tail that dies under the 10-core threshold, like real hash
# features). Criteo-like: a few multi-million-id fields, many small ones.
CAT_HEADS = [300, 500, 1_800_000, 4_000, 18_000, 14, 12_000, 500, 3,
             1_200_000, 4_500, 900_000, 3_000, 26, 9_000, 700_000, 10,
             4_000, 1_800, 4, 450_000, 15, 14, 40_000, 60, 30_000]
TAIL = 50_000_000       # ids >= head: ~1 occurrence each -> below 10-core
TAIL_FRAC = 0.12        # fraction of draws that fall into the tail
ZIPF_S = 0.55           # mild skew: head rank r count ~ r^-s


def cat_column(rng, n, head, latent):
    u = rng.random(n)
    # inverse-CDF of counts ~ r^-s on [1, head]: r = head * u^(1/(1-s))
    r = (head * u ** (1.0 / (1.0 - ZIPF_S))).astype(np.int64)
    # weave the latent factor into the low ranks so labels depend on ids
    r = np.where((r < max(8, head // 50)) & (latent > 0.5),
                 (r + latent_shift(head)) % max(head, 1), r)
    tail = rng.random(n) < TAIL_FRAC
    t = rng.integers(head, head + TAIL, n)
    return np.where(tail, t, r)


def latent_shift(head):
    return max(1, head // 97)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--rows", type=int, default=40_000_000)
    p.add_argument("--seed", type=int, default=17)
    p.add_argument("--chunk", type=int, default=2_000_000)
    a = p.parse_args()

    rng = np.random.default_rng(a.seed)
    t0 = time.time()
    written = 0
    with open(a.out, "w") as f:
        while written < a.rows:
            n = min(a.chunk, a.rows - written)
            latent = rng.random(n)
            cols = {}
            logits = -1.8 + 2.2 * (latent - 0.5)
            for i in range(13):
                v = rng.integers(-1, 60 + 40 * (i % 4), n).astype(float)
                if i % 3 == 0:
                    v = np.where(latent > 0.6, v * 2 + 3, v)
                    logits += 0.12 * (v > 40)
                v[rng.random(n) < 0.15 + 0.02 * i] = np.nan
                cols[f"I{i + 1}"] = v
            for i, head in enumerate(CAT_HEADS):
                c = cat_column(rng, n, head, latent)
                if head > 1000:
                    logits += 0.08 * ((c % 11) == 3)
                cols[f"C{i + 1}"] = c
            label = (rng.random(n)
                     < 1.0 / (1.0 + np.exp(-logits))).astype(np.int64)
            df = pd.DataFrame({"click": label, **cols})
            # ints as categorical tokens; NaN -> empty cell (dac format)
            df.to_csv(f, sep="\t", header=False, index=False,
                      float_format="%.0f", na_rep="")
            written += n
            print(f"  {written}/{a.rows} rows ({time.time() - t0:.0f}s)",
                  flush=True, file=sys.stderr)
    print(f"gen_raw: {written} rows -> {a.out} "
          f"({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
