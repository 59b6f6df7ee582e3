"""Round-artifact runner for the driver's multi-chip dry-run contract:
executes __graft_entry__.dryrun_multichip(8) on a virtual 8-device CPU
mesh and records MULTICHIP_r0N.json (same shape as the driver's record).

    python tools/multichip_check.py --round 5

Must run with the CPU platform + fake devices; sets the env itself and
re-execs, since sitecustomize pre-imports jax (CLAUDE.md)."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--timeout", type=int, default=1200)
    args = p.parse_args(argv)

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{args.n}")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (f"from __graft_entry__ import dryrun_multichip; "
            f"dryrun_multichip({args.n})")
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                              env=env, capture_output=True, text=True,
                              timeout=args.timeout)
        rc, tail = proc.returncode, (proc.stdout + proc.stderr)[-2000:]
    except subprocess.TimeoutExpired:
        rc, tail = -1, f"timeout after {args.timeout}s"
    record = {"n_devices": args.n, "rc": rc, "ok": rc == 0,
              "skipped": False, "seconds": round(time.time() - t0, 1),
              "tail": tail}
    out = os.path.join(REPO, f"MULTICHIP_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"wrote {out} ok={rc == 0} ({record['seconds']}s)")
    return 0 if rc == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
