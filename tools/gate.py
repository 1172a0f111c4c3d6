"""One-shot release gate: every check the driver or judge runs, in one
command, fail-fast ordering (cheap checks first).

Usage: python tools/gate.py [--full]
  default: type audit (sf0.001) + oracle gate (sf0.01) + plan audit
  --full : adds the sf0.001 and sf0.1 exact oracle sweeps + pytest
"""

from __future__ import annotations

import subprocess
import sys

STEPS = [
    ("dtype parity (sf0.001)", [sys.executable, "tools/type_audit.py"]),
    ("oracle gate (sf0.01)", [sys.executable, "tools/check.py", "/root/testdata/sf0.01"]),
    ("plan audit", [sys.executable, "tools/explain_audit.py"]),
]

FULL_STEPS = [
    ("oracle gate (sf0.001)", [sys.executable, "tools/check.py", "/root/testdata/sf0.001"]),
    ("oracle gate (sf0.1)", [sys.executable, "tools/check.py", "/root/testdata/sf0.1"]),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
]


def main() -> int:
    steps = list(STEPS)
    if "--full" in sys.argv:
        steps += FULL_STEPS
    for name, cmd in steps:
        print(f"=== {name}: {' '.join(cmd[1:])}", flush=True)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            print(f"GATE FAILED at: {name}")
            return rc
    print("GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
