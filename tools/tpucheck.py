"""Compiled-TPU smoke check (VERDICT r1 item 7): run the kernel-equivalence
tests plus a train-step smoke ON THE REAL CHIP (Mosaic-compiled, not
interpret mode) and record a driver-visible artifact.

The CI suite runs these same tests in interpret mode on CPU
(tests/conftest.py); this script is the per-round proof that the compiled
kernels still meet the scale-aware equivalence contract on hardware
(max|a-ref| <= ABS + REL*max|ref|, constants + measured margins in
tests/_tolerances.py).

The on-chip kernel tier runs a REPRESENTATIVE SUBSET — one test per kernel
x shape regime — not the full tolerance matrix (which runs in CPU interpret
mode in the main suite). Rationale (VERDICT r4 weak #2): the full 25-test
on-chip run took 1601 s green-case on an idle tunnel and timed out at
2700 s under contention; a check with no margin against its budget keeps
flapping. The subset + the persistent compilation cache (set below; works
through the tunnel) targets <900 s green-case on a SHARED tunnel.

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

# One on-chip test per compiled kernel / shape regime:
#   splat fwd, splat bwd, race contract (all-points-one-cell), RGB splat;
#   fused sil render, fused render+MSE, two-kernel RGB+MSE, one-pass sil
#   MSE, one-pass sigma Jacobian (predict_scale contract), one-pass RGB
#   MSE, two-column-Jacobian one-pass RGB (pose-ensemble path, argmin
#   downstream), e2e predict_scale loss path, banded kernel, banded
#   auto-dispatch (lax.cond both branches).
KERNEL_SUBSET = [
    "tests/test_pallas_kernel.py::test_forward_matches_separable",
    "tests/test_pallas_kernel.py::test_backward_matches_separable",
    "tests/test_pallas_kernel.py::test_adversarial_all_points_one_cell",
    "tests/test_pallas_kernel.py::test_rgb_splat_matches_separable",
    "tests/test_render_kernel.py::test_fused_sil_fwd_bwd",
    "tests/test_render_kernel.py::test_fused_mse_fwd_bwd",
    "tests/test_render_kernel.py::test_fused_rgb_mse_fwd_bwd",
    "tests/test_render_kernel.py::test_onepass_mse_matches_twopass",
    "tests/test_render_kernel.py::test_onepass_sigma_grad",
    "tests/test_render_kernel.py::test_onepass_rgb_mse_matches_twopass",
    "tests/test_render_kernel.py::test_onepass2_rgb_matches_twopass",
    "tests/test_render_kernel.py::test_predict_scale_fused_matches_unfused",
    "tests/test_render_kernel.py::test_banded_mse_matches_dense",
    "tests/test_render_kernel.py::test_banded_auto_dispatch",
]

CHECKS = [
    ("kernel_equivalence",
     [sys.executable, "-m", "pytest", "-q", "--no-header"] + KERNEL_SUBSET),
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
    # persistent compile cache: works through the tunnel, turns warm
    # re-runs' 20-120s remote compiles into seconds (CLAUDE.md)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
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
