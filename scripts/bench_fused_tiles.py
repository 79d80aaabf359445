"""Fused-kernel tile sweep on the real chip (BASELINE.md pending item 4).

Legality first: Mosaic needs the time tile to divide T and be a multiple
of 8 (or span the whole axis), and explicit tiles > 32 steps are rejected
(static in-kernel unroll). At the benchmark T=1000 the only bounded legal
time tile is C=8 (1000 = 8 * 125; 16, 24, 32 do not divide it), so larger
time tiles are swept at T=1024 instead — C in {8, 16, 32} — against the
T=1024 default, isolating the tile effect from the chain-length effect.

Usage: python scripts/bench_fused_tiles.py [batch]
Prints one JSON line per (T, row_tile, time_tile) combo, same honest
protocol as bench.py (tiles applied via PYSVIHMM_FUSED_TILES).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    sweeps = [
        (1000, None),  # tiler default at the benchmark T (expected (512, 8))
        (1000, (512, 8)),
        (1000, (256, 8)),
        (1000, (128, 8)),
        (1024, None),
        (1024, (512, 8)),
        (1024, (512, 16)),
        (1024, (512, 32)),
        (1024, (256, 32)),
    ]
    for T, tiles in sweeps:
        bench.T = T
        if tiles is None:
            os.environ.pop("PYSVIHMM_FUSED_TILES", None)
        else:
            os.environ["PYSVIHMM_FUSED_TILES"] = f"{tiles[0]},{tiles[1]}"
        try:
            sps, dt = bench.bench_jax(batch=batch, method="pallas_fused")
            out = {"T": T, "tiles": tiles, "seq_per_s": round(sps, 1),
                   "ms_per_estep": round(dt * 1e3, 3)}
        except Exception as e:  # illegal combo or compile failure: record it
            out = {"T": T, "tiles": tiles, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
