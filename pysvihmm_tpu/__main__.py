"""Package CLI: ``python -m pysvihmm_tpu <command> [args]``.

Commands:
  experiment  — config-driven engine runs (scripts/run_experiment.py)
  baseline    — the five BASELINE.json eval configs (scripts/run_baseline_configs.py)
  bench       — E-step throughput benchmark (bench.py at the repo root,
                importable fallback: inline equivalent)

The reference's "CLI" was per-engine test/experiment scripts run directly
(SURVEY.md §1 L4); this is the packaged equivalent.
"""

from __future__ import annotations

import sys
from pathlib import Path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root / "scripts"))
    sys.path.insert(0, str(root))
    if cmd == "experiment":
        import run_experiment

        return run_experiment.main(rest)
    if cmd == "baseline":
        import run_baseline_configs

        return run_baseline_configs.main(rest)
    if cmd == "bench":
        import bench

        sys.argv = ["bench.py", *rest]
        return bench.main()
    print(f"unknown command {cmd!r}; one of: experiment, baseline, bench")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
