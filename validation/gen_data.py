"""Generate the shared synthetic Avazu-like dataset for AUC-parity runs.

Real Avazu/Criteo raw data is not obtainable in this environment (no network
egress), so the parity contract (BASELINE.md "paper AUC +-0.0005") is
validated the strongest way available: run the TORCH REFERENCE ITSELF
(/root/reference, CPU) and map_tpu on byte-identical artifacts and compare
AUC/LogLoss. See validation/README.md.

Usage: python validation/gen_data.py [num_rows]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from map_tpu.data import synth

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "synthazu")


def main() -> None:
    num_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = synth.generate_realistic(DATA_DIR, name="synthazu",
                                   num_rows=num_rows, seed=7)
    print(f"wrote {out} ({num_rows} rows)")


if __name__ == "__main__":
    main()
