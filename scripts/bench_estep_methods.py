"""Compare full-E-step throughput across methods on the real chip.

Usage: python scripts/bench_estep_methods.py [batch] [method ...]
                                               [--family gaussian|diag_gaussian]
Defaults: batch=1024, methods = pallas pallas_fused scan, family=gaussian.
Prints one JSON line per method (same honest protocol as bench.py). The
diag_gaussian family shrinks the fused paths' feature width 1+D+D^2 -> 1+2D
(73 -> 17 at the benchmark D=8).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    args = sys.argv[1:]
    family = "gaussian"
    if "--family" in args:
        i = args.index("--family")
        family = args[i + 1]
        del args[i : i + 2]
    batch = int(args[0]) if args else 1024
    methods = args[1:] or ["pallas", "pallas_fused", "scan"]
    for m in methods:
        sps, dt = bench.bench_jax(batch=batch, method=m, family=family)
        print(json.dumps({"method": m, "family": family,
                          "seq_per_s": round(sps, 1),
                          "ms_per_estep": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
