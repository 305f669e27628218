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
