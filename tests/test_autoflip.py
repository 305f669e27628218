"""Queue-log parsing and flip decision for tools/r3_autoflip.py.

The autoflip step runs unattended at the tail of the TPU measurement
queue and rewrites package defaults, so its log parsing and decision
rule get the same unit coverage as package code.
"""

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "r3_autoflip",
    Path(__file__).resolve().parents[1] / "tools" / "r3_autoflip.py")
autoflip = importlib.util.module_from_spec(spec)
spec.loader.exec_module(autoflip)


LOG = """\
=== Tue Aug 18 05:00:00 UTC 2026 health check
[AxonDevice(id=0)]
=== Tue Aug 18 05:01:00 UTC 2026 headline deepfuse b16 (current default, comparison base)
{{"metric": "t", "value": {base}, "unit": "pairs/s", "vs_baseline": 0.05}}
=== Tue Aug 18 05:10:00 UTC 2026 headline deepfuse b16 with s2d packed chain
{{"metric": "t", "value": {s2d}, "unit": "pairs/s"}}
=== Tue Aug 18 05:20:00 UTC 2026 s2d with raised vmem budget (packed dec0 rows=16+ssa)
{{"metric": "t", "value": {budget}, "unit": "pairs/s"}}
=== Tue Aug 18 05:30:00 UTC 2026 s2d_io kernels: TPU compile + parity smoke
{parity}
=== Tue Aug 18 05:35:00 UTC 2026 s2d with packed enter/exit kernels (MMIF_S2D_IO=1)
{{"metric": "t", "value": {io}, "unit": "pairs/s"}}
"""


def write_log(tmp_path, parity="s2d_io TPU parity OK", **vals):
    p = tmp_path / "q.log"
    p.write_text(LOG.format(parity=parity, **vals))
    return str(p)


def test_parse_extracts_step_values(tmp_path):
    log = write_log(tmp_path, base=101.5, s2d=118.2, budget=124.9, io=120.0)
    vals, parity_ok = autoflip.parse(log)
    assert vals == {"base": 101.5, "s2d": 118.2, "budget": 124.9,
                    "io": 120.0}
    assert parity_ok


def test_parse_skips_error_and_junk_lines(tmp_path):
    p = tmp_path / "q.log"
    p.write_text(
        "=== Tue Aug 18 05:01:00 UTC 2026 headline deepfuse b16 "
        "(current default, comparison base)\n"
        "not json {\n"
        '{"metric": "t", "value": 0, "unit": "pairs/s"}\n'
        '{"metric": "t", "error": "backend init timed out"}\n'
        '{"metric": "t", "value": 99.0, "unit": "pairs/s"}\n')
    vals, parity_ok = autoflip.parse(str(p))
    assert vals == {"base": 99.0}  # zero / error / junk all skipped
    assert not parity_ok


def test_parse_uses_only_the_last_queue_run(tmp_path):
    """The queue log appends across re-runs; a stale base from a
    degraded earlier run must not pair with a fresh s2d number."""
    run1 = LOG.format(parity="", base=80.0, s2d=0, budget=0, io=0)
    run2 = LOG.format(parity="s2d_io TPU parity OK",
                      base=101.5, s2d=103.0, budget=102.0, io=102.5)
    p = tmp_path / "q.log"
    p.write_text(run1 + run2)
    vals, parity_ok = autoflip.parse(str(p))
    assert vals["base"] == 101.5      # run 2's base, not run 1's 80.0
    assert parity_ok
    assert autoflip.decide(vals, parity_ok) is None   # below 2% margin


def test_decide_picks_best_variant_over_margin():
    vals = {"base": 100.0, "s2d": 110.0, "budget": 115.0, "io": 112.0}
    assert autoflip.decide(vals, parity_ok=True) == "budget"


def test_decide_below_margin_stays_off():
    vals = {"base": 100.0, "s2d": 101.9, "budget": 101.0, "io": 101.5}
    assert autoflip.decide(vals, parity_ok=True) is None


def test_decide_io_needs_parity_smoke():
    vals = {"base": 100.0, "s2d": 110.0, "io": 120.0}
    assert autoflip.decide(vals, parity_ok=False) == "s2d"
    assert autoflip.decide(vals, parity_ok=True) == "io"


def test_decide_incomplete_measurements():
    assert autoflip.decide({}, parity_ok=True) is None
    assert autoflip.decide({"base": 100.0}, parity_ok=True) is None
    assert autoflip.decide({"s2d": 120.0}, parity_ok=True) is None


def _scratch_repo(tmp_path, parity="s2d_io TPU parity OK", **vals):
    """Minimal git repo mirroring the bits main() touches."""
    import subprocess
    pkg = tmp_path / "multi_modal_image_fusion_tpu" / "ops"
    pkg.mkdir(parents=True)
    (pkg / "s2d.py").write_text(
        "S2D_DEFAULT = False\n"
        "S2D_IO_DEFAULT = False\n"
        "S2D_VMEM_BUDGET = 55 * 1024 * 1024\n")
    ok_test = tmp_path / "parity_ok.py"
    ok_test.write_text("def test_ok():\n    assert True\n")
    bad_test = tmp_path / "parity_bad.py"
    bad_test.write_text("def test_bad():\n    assert False\n")
    for cmd in (["git", "init", "-q"], ["git", "add", "-A"],
                ["git", "-c", "user.name=t", "-c", "user.email=t@t",
                 "commit", "-qm", "init"]):
        subprocess.run(cmd, cwd=tmp_path, check=True)
    logp = tmp_path / "q.log"
    logp.write_text(LOG.format(parity=parity, **vals))
    return str(logp), str(ok_test), str(bad_test)


def test_main_flips_commits_on_win(tmp_path, monkeypatch):
    """End-to-end: a winning budget variant rewrites both constants,
    passes the parity gate, and commits — the exact unattended path the
    queue runs."""
    import subprocess
    log, ok_test, _ = _scratch_repo(tmp_path, base=101.5, s2d=118.2,
                                    budget=124.9, io=120.0)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(autoflip, "PARITY_TESTS", [ok_test])
    monkeypatch.setenv("GIT_AUTHOR_NAME", "t")
    monkeypatch.setenv("GIT_AUTHOR_EMAIL", "t@t")
    monkeypatch.setenv("GIT_COMMITTER_NAME", "t")
    monkeypatch.setenv("GIT_COMMITTER_EMAIL", "t@t")
    assert _run_main(log) == 0
    src = (tmp_path / "multi_modal_image_fusion_tpu/ops/s2d.py").read_text()
    assert "S2D_DEFAULT = True" in src
    assert "S2D_VMEM_BUDGET = 64 * 1024 * 1024" in src
    assert "S2D_IO_DEFAULT = False" in src      # io did not win
    head = subprocess.run(["git", "log", "--oneline", "-1"],
                          cwd=tmp_path, capture_output=True, text=True)
    assert "packed s2d" in head.stdout
    # the flip was committed, not left dangling (untracked files like
    # the queue log are fine)
    st = subprocess.run(["git", "status", "--porcelain"], cwd=tmp_path,
                        capture_output=True, text=True)
    assert all(line.startswith("??")
               for line in st.stdout.splitlines()), st.stdout


def test_main_reverts_on_parity_failure(tmp_path, monkeypatch):
    """A failing parity gate must restore the original constants."""
    log, _, bad_test = _scratch_repo(tmp_path, base=101.5, s2d=118.2,
                                     budget=124.9, io=120.0)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(autoflip, "PARITY_TESTS", [bad_test])
    assert _run_main(log) == 1
    src = (tmp_path / "multi_modal_image_fusion_tpu/ops/s2d.py").read_text()
    assert "S2D_DEFAULT = False" in src
    assert "S2D_VMEM_BUDGET = 55 * 1024 * 1024" in src


def _run_main(log):
    import sys
    argv = sys.argv
    sys.argv = ["r3_autoflip.py", log]
    try:
        return autoflip.main()
    finally:
        sys.argv = argv


def test_edit_targets_exist_in_s2d_module():
    # the assignments the flip rewrites must stay present and unique
    # (either pre- or post-flip value, so this holds after a real flip)
    import re
    src = (Path(__file__).resolve().parents[1] / "multi_modal_image_fusion_tpu"
           / "ops" / "s2d.py").read_text()
    for pat in (r"^S2D_DEFAULT = (True|False)$",
                r"^S2D_IO_DEFAULT = (True|False)$",
                r"^S2D_VMEM_BUDGET = \d+ \* 1024 \* 1024$"):
        assert len(re.findall(pat, src, re.M)) == 1, pat
