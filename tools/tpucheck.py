"""Compiled-TPU smoke check (VERDICT r1 item 7): run the kernel-equivalence
tests plus a train-step smoke ON THE REAL CHIP (Mosaic-compiled, not
interpret mode) and record a driver-visible artifact.

The CI suite runs these same tests in interpret mode on CPU
(tests/conftest.py); this script is the per-round proof that the compiled
kernels still meet the scale-aware equivalence contract on hardware
(max|a-ref| <= ABS + REL*max|ref|, constants + measured margins in
tests/_tolerances.py).

    python tools/tpucheck.py --round 2      # writes TPUCHECK_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECKS = [
    ("kernel_equivalence",
     [sys.executable, "-m", "pytest", "-q", "--no-header",
      "tests/test_pallas_kernel.py", "tests/test_render_kernel.py"]),
    ("train_step_smoke",
     [sys.executable, "-m", "pytest", "-q", "--no-header",
      "tests/test_train_integration.py::test_loss_decreases_and_chamfer_beats_random"]),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--timeout", type=int, default=1800, help="per check, s")
    args = p.parse_args(argv)

    env = dict(os.environ, TPU_TESTS="1")
    results, ok = [], True
    for name, cmd in CHECKS:
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=REPO, env=env,
                                  capture_output=True, text=True,
                                  timeout=args.timeout)
            rc, tail = proc.returncode, (proc.stdout + proc.stderr)[-1500:]
        except subprocess.TimeoutExpired:
            rc, tail = -1, f"timeout after {args.timeout}s"
        results.append({"check": name, "rc": rc,
                        "seconds": round(time.time() - t0, 1),
                        "tail": tail.strip().splitlines()[-4:]})
        ok = ok and rc == 0
        print(f"[{name}] rc={rc} ({results[-1]['seconds']}s)", flush=True)

    record = {"ok": ok, "backend": "tpu", "checks": results,
              "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    out = os.path.join(REPO, f"TPUCHECK_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out} ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
