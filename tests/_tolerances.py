"""Scale-aware equivalence tolerances for the Pallas kernel contract.

The kernel-vs-XLA comparisons assert  max|a - ref| <= ABS + REL * max|ref|
— a relative bound anchored to the reference's own magnitude, instead of
one loose absolute atol that would mask regressions whenever the compared
quantity is small (advisor finding r2: a flat 2e-2 gradient atol on TPU
says nothing when gradients are O(0.1)).

The TPU constants are set from MEASURED on-chip error margins (run the
kernel test files with KERNEL_ERR_LOG=<path> under TPU_TESTS=1; see
tools/kernel_err_*.jsonl committed per round) with ~5x headroom. CPU
(interpret mode) runs the same math through XLA twice, so margins are
float32-roundoff sized.

Set KERNEL_ERR_LOG to a path to append one JSON line per comparison with
the actual max-abs / relative error — that log is how the constants stay
honest when kernels change.
"""

from __future__ import annotations

import contextlib
import json
import os

import numpy as np


@contextlib.contextmanager
def ref_precision():
    """Compute XLA *reference* paths at highest matmul precision.

    Measured on-chip (r3, /tmp diag vs a float64 CPU ground truth at the
    test_fused_sil_h_tiled shapes): the XLA reference at DEFAULT TPU
    matmul precision carries rel ~2.7e-3 of its own MXU rounding — MORE
    than the Pallas kernel's true error (rel ~2.0e-3). At default
    precision the equivalence tests therefore bound ref-noise + kernel
    error, and kernel-layout changes (e.g. the r3 lane-packing) can trip
    the tolerance without any kernel regression. Under this context the
    reference lands within rel ~5e-6 of float64, so check_fwd/check_grad
    bound the KERNEL's error alone. Wrap ONLY pure-reference
    computations: loss-level A/B tests share the nets between both sides
    and must keep both at production precision."""
    import jax
    with jax.default_matmul_precision("highest"):
        yield

_TPU = bool(os.environ.get("TPU_TESTS"))

# forward outputs (silhouettes, grids, images, SSE reductions).
# measured margins: CPU (interpret) max rel 3e-6 across all 32 labeled
# comparisons (tools/kernel_err_cpu_r3.txt); TPU values below are from the
# on-chip measurement run (tools/kernel_err_tpu_r3.txt).
FWD_ABS = 2e-4 if _TPU else 1e-6
FWD_REL = 2e-3 if _TPU else 2e-5
# gradients (splat/collapse backward, custom-VJP outputs)
GRAD_ABS = 2e-4 if _TPU else 1e-6
GRAD_REL = 5e-3 if _TPU else 2e-5


def _check(actual, ref, abs_tol, rel_tol, label):
    a = np.asarray(actual, dtype=np.float64)
    r = np.asarray(ref, dtype=np.float64)
    assert a.shape == r.shape, (label, a.shape, r.shape)
    scale = float(np.max(np.abs(r))) if r.size else 0.0
    err = float(np.max(np.abs(a - r))) if r.size else 0.0
    log = os.environ.get("KERNEL_ERR_LOG")
    if log:
        with open(log, "a") as f:
            f.write(json.dumps({
                "label": label, "max_abs_err": err, "ref_scale": scale,
                "rel_err": err / max(scale, 1e-30), "tpu": _TPU}) + "\n")
    tol = abs_tol + rel_tol * scale
    assert err <= tol, (
        f"{label}: max|a-ref|={err:.3e} > {tol:.3e} "
        f"(abs {abs_tol:g} + rel {rel_tol:g} * scale {scale:.3e})")


def check_fwd(actual, ref, label=""):
    """Assert a forward kernel output matches the XLA reference."""
    _check(actual, ref, FWD_ABS, FWD_REL, label or "fwd")


def check_grad(actual, ref, label=""):
    """Assert a custom-VJP gradient matches the autodiff reference."""
    _check(actual, ref, GRAD_ABS, GRAD_REL, label or "grad")
