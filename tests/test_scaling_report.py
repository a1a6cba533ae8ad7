"""scaling.py report routing + steal stamping (no Spark).

The scaling study's write path clobbered the hand-curated
BENCH/BASELINE.md twice in round 6 (once with a contaminated draw):
raw runs must default to BENCH/scaling_report.md, with BASELINE.md an
explicit opt-in, and each level's JSON must carry the host CPU-steal
measured over the run so contaminated draws are visible in the record.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_scaling():
    # bench.py at the repo root shadows the bench/ directory, so the
    # module is loaded by file path (same reason scaling runs do)
    spec = importlib.util.spec_from_file_location(
        "scaling_under_test", os.path.join(REPO, "bench", "scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


LO = {
    "cpus": 1,
    "ingest_sec": 10.0,
    "run_sec": 100.0,
    "points": 1000,
    "points_per_sec": 10.0,
}
HI = {
    "cpus": 4,
    "ingest_sec": 3.0,
    "run_sec": 25.0,
    "points": 1000,
    "points_per_sec": 40.0,
}


def test_write_report_defaults_to_scratch_file(tmp_path, monkeypatch):
    m = _load_scaling()
    monkeypatch.setattr(m, "REPO", str(tmp_path))
    m.write_report(LO, HI, rows=1000, repeats=1)
    assert (tmp_path / "BENCH" / "scaling_report.md").exists()
    assert not (tmp_path / "BENCH" / "BASELINE.md").exists()
    body = (tmp_path / "BENCH" / "scaling_report.md").read_text()
    assert "1.000" in body  # eff = 40 / (4*10)


def test_write_report_baseline_is_opt_in(tmp_path, monkeypatch):
    m = _load_scaling()
    monkeypatch.setattr(m, "REPO", str(tmp_path))
    m.write_report(LO, HI, rows=1000, repeats=1, out_name="BASELINE.md")
    assert (tmp_path / "BENCH" / "BASELINE.md").exists()


def test_cpu_times_reads_host_jiffies():
    m = _load_scaling()
    t = m._cpu_times()
    if t is None:  # non-Linux: the stamp is skipped, not wrong
        return
    assert len(t) >= 8 and all(isinstance(x, int) for x in t)
    assert sum(t) > 0


def test_run_level_stamps_steal_pct(tmp_path, monkeypatch):
    m = _load_scaling()
    if m._cpu_times() is None:
        return
    # stub the subprocess: run_level must parse the last stdout line and
    # stamp steal_pct onto it without touching the measured fields
    class FakeOut:
        stdout = 'noise\n{"cpus": 1, "points_per_sec": 5.0}\n'

    monkeypatch.setattr(
        m.subprocess, "run", lambda *a, **k: FakeOut()
    )
    r = m.run_level(1, 100, via_submit=False)
    assert r["points_per_sec"] == 5.0
    assert "steal_pct" in r and 0.0 <= r["steal_pct"] <= 100.0
