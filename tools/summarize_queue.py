"""Summarize the round-3 TPU measurement queue log into markdown.

Parses docs/r3_queue_results.log (written by tools/r3_tpu_queue.sh via
tee), extracts each step's headline result — bench JSON lines, probe
summary lines, training steps/s, failures — and prints a compact
markdown table for docs/PERFORMANCE.md.

Usage: python tools/summarize_queue.py [logpath]
"""

import json
import re
import sys


def parse(path):
    steps = []      # (title, [result lines])
    cur = None
    with open(path, errors="replace") as f:
        for raw in f:
            line = raw.rstrip("\n")
            m = re.match(r"^=== \w+ .*?\d{4} (.*)$", line)
            if m:
                cur = (m.group(1), [])
                steps.append(cur)
                continue
            if cur is None:
                continue
            keep = False
            if line.startswith("{") and '"metric"' in line:
                keep = True
            elif re.search(r"pairs/s|steps/s|TF-|TOPS|ms/batch|ms$|"
                           r"parity OK|FAILED|Error|error|exit: [1-9]|"
                           r"speedup|epoch", line):
                keep = True
            if keep and len(cur[1]) < 12:
                cur[1].append(line.strip())
    return steps


def fmt(steps):
    out = ["| queue step | result |", "|---|---|"]
    for title, lines in steps:
        picked = []
        for ln in lines:
            if ln.startswith("{"):
                try:
                    d = json.loads(ln)
                    v = d.get("value")
                    err = d.get("error")
                    picked.append(f"**{v:.1f} {d.get('unit', '')}**"
                                  + (f" ({err})" if err else ""))
                    continue
                except Exception:
                    pass
            picked.append(ln)
        res = "; ".join(picked[:4]) if picked else "(no output captured)"
        out.append(f"| {title} | {res} |")
    return "\n".join(out)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "docs/r3_queue_results.log"
    print(fmt(parse(path)))
