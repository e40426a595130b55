"""Harvest chip-run evidence into BENCH_NOTES.md (VERDICT r4 #10).

Round 3 and round 4 both ended with measured results stranded in /tmp logs
("see c4_10m_v4" dangling pointers).  This makes the discipline structural:
every JSON result line and every ``# ``-prefixed phase-timing line in a run
log is appended verbatim to BENCH_NOTES.md under a tagged section, so a chip
session's results survive the session by running ONE command.

Usage: python scripts/harvest_logs.py <section-title> <log> [<log> ...]
"""

import sys
from pathlib import Path

NOTES = Path(__file__).resolve().parent.parent / "BENCH_NOTES.md"


def harvest_lines(text: str):
    """Result lines: JSON objects and '# '-prefixed phase timings."""
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("{") and s.endswith("}"):
            yield s
        elif s.startswith("# ") and not s.startswith("# WARNING"):
            yield s


def main(title: str, *logs: str) -> None:
    blocks = []
    for log in logs:
        p = Path(log)
        if not p.exists():
            print(f"missing: {log}", file=sys.stderr)
            continue
        lines = list(harvest_lines(p.read_text(errors="replace")))
        if lines:
            blocks.append(f"From `{p}`:\n\n```\n" + "\n".join(lines) + "\n```")
        else:
            print(f"no result lines in {log}", file=sys.stderr)
    if not blocks:
        raise SystemExit("nothing harvested")
    section = f"\n## {title} (harvested)\n\n" + "\n\n".join(blocks) + "\n"
    with NOTES.open("a") as f:
        f.write(section)
    print(f"appended {sum(b.count(chr(10)) for b in blocks)} lines to {NOTES}")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
