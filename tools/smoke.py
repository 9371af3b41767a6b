#!/usr/bin/env python
"""Fast targeted differential over the critical never-driver-sampled
queries (tests/test_oracle_differential.py::CRITICAL_NEVER_SAMPLED).

Usage: python tools/smoke.py  [extra pytest args...]

Runs only those ~22 queries through the same Spark-vs-DuckDB comparison
as the full suite — ~2 min instead of the ~6-min full driver_sim — so
any refactor touching the dedup/ANN/streaming families gets a same-
session correctness signal even though the driver sample never draws
them."""

import subprocess
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_oracle_differential import CRITICAL_NEVER_SAMPLED  # noqa: E402

expr = " or ".join(CRITICAL_NEVER_SAMPLED)
cmd = [
    sys.executable, "-m", "pytest",
    "tests/test_oracle_differential.py",
    "-k", expr, "-q", *sys.argv[1:],
]
raise SystemExit(subprocess.call(cmd, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
