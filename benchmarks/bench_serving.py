"""Serving throughput on the canonical geometry (VERDICT round-3 next #9:
target >= 2x the round-3 105k rows/s, which was the tunnel's ~12 MB/s H2D
floor at 96 B/row). Measures the Predictor on 1M synthetic field-blocked
rows in three configurations:

  v1       - no packing, no overlap (prefetch=1 approximates round 3)
  overlap  - double-buffered H2D only
  v2       - byte-packed ids + double-buffering (the production default)

Run on hardware: python benchmarks/bench_serving.py [rows]
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench_pretrain as bp


def main():
    import jax

    from map_tpu import models
    from map_tpu.config import Config
    from map_tpu.serve import Predictor
    from map_tpu.train import checkpoints

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    idx_low, idx_high, v = bp.geometry()
    f = len(bp.FIELD_SIZES)
    cfg = bp.base_config(v, f, idx_low, idx_high, pretrain=False,
                         field_blocked_lookup=True)
    model = models.from_config(cfg)
    rng = np.random.default_rng(0)
    rows = np.stack([rng.integers(a, h, n)
                     for a, h in zip(idx_low, idx_high)], axis=1).astype(np.int32)

    with tempfile.TemporaryDirectory() as d:
        variables = model.init({"params": jax.random.PRNGKey(0)}, rows[:8])
        checkpoints.save_model(jax.device_get(variables), d, 0)
        Config(**{k: val for k, val in cfg.__dict__.items()}).save(d)

        def run(name, **kw):
            pred = Predictor(d, 0, batch_size=65536, **kw)
            pred.predict_logits(rows[:65536 * 2])  # warm
            t0 = time.perf_counter()
            out = pred.predict_logits(rows)
            dt = time.perf_counter() - t0
            print(f"{name:10s} {n / dt:10.0f} rows/s  ({dt:.2f} s)  "
                  f"checksum={float(out.sum()):.3f}", flush=True)
            return n / dt

        run("v1", prefetch=1, compress_transfer=False)
        run("overlap", prefetch=2, compress_transfer=False)
        rate = run("v2", prefetch=2, compress_transfer=True)
        import json
        print(json.dumps({"metric": "serving_rows_per_sec", "value": round(rate),
                          "unit": "rows/s", "vs_round3": round(rate / 105_000, 2)}))


if __name__ == "__main__":
    main()
