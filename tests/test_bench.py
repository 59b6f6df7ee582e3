"""bench.py honesty contract (VERDICT r3 weak #3): the ONE JSON line must
name the render path that actually ran, and a Pallas failure must flip the
tag to xla_fallback (and surface on stderr) instead of silently reporting
a plausible slow number."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(bench, capsys):
    bench.main()
    out = capsys.readouterr()
    return json.loads(out.out.strip().splitlines()[-1]), out.err


def test_path_tag_present(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_jax", lambda use_pallas: 1e7)
    monkeypatch.setattr(bench, "bench_oracle", lambda: 4e4)
    rec, _ = _run_main(bench, capsys)
    assert rec["path"] in ("pallas_onepass", "pallas", "xla")
    assert rec["vs_baseline"] == round(1e7 / bench.PINNED_ORACLE, 2)


def test_spread_and_mfu_fields(monkeypatch, capsys):
    """VERDICT r4 weak #3 / missing #4: the JSON carries the best-of-3
    spread (value_worst, cv) and the cost-model MFU fields so a contended
    BENCH_r0N is distinguishable from a regression and the roofline claim
    is auditable from the artifact."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_jax", lambda use_pallas: {
        "value": 2.5e7, "value_worst": 2.3e7, "cv": 0.03,
        "tflops": 40.0, "mfu": 0.2})
    monkeypatch.setattr(bench, "bench_oracle", lambda: 4e4)
    rec, _ = _run_main(bench, capsys)
    assert rec["value"] == 2.5e7 and rec["value_worst"] == 2.3e7
    assert rec["cv"] == 0.03
    assert rec["tflops"] == 40.0 and rec["mfu"] == 0.2


def test_mfu_cost_model_single_source():
    """The bench MFU must come from the kernel's own cost model."""
    from tpu_unsup_pc.ops.pallas.render_kernel import fused_mse_train_flops
    # 6*N*D^3 per pair dense; banded shrinks depth extent to the band
    assert fused_mse_train_flops(1, 2048, 64) == 6 * 2048 * 64 ** 3
    assert fused_mse_train_flops(10, 8192, 256, band=56) \
        == 6 * 10 * 8192 * 56 * 256 * 256


def test_pallas_failure_flips_tag_and_is_loud(monkeypatch, capsys):
    bench = _load_bench()

    def jax_path(use_pallas):
        if use_pallas:
            raise RuntimeError("kernel exploded")
        return 5e6

    monkeypatch.setattr(bench, "bench_jax", jax_path)
    monkeypatch.setattr(bench, "bench_oracle", lambda: 4e4)
    rec, err = _run_main(bench, capsys)
    assert rec["path"] == "xla_fallback"
    assert "kernel exploded" in err          # failure surfaced, not eaten
    assert rec["value"] == 5e6
