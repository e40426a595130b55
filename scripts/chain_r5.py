"""Round-5 chip evidence chain: run the remaining VERDICT-r4 measurements
sequentially on the one real chip (one chip client at a time — attaching a
second client can crash the TPU worker, CLAUDE.md).

Order is by evidence value:
  1. levers_bench c2c 1M   — the promised "Traversal levers at 1M" verdict
                             (BENCH_NOTES round-4 text points at it)
  2. ingest_bench 2M x 768 — out-of-core ingest rows/s, measurement not
                             arithmetic (VERDICT r4 #9)
  3. scan_scaling auto     — confirm scan_mode="auto" tracks the measured
                             binned/folded frontier (VERDICT r4 #3)
  4. scan_study_r3         — the 1M MFU kernel point that HTTP-413'd in
                             round 4 (corpus now passed as an argument)

Each step logs to logs/<name>_r5.log and the chain continues past failures.
Usage: nohup python scripts/chain_r5.py > logs/chain_r5.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")
os.makedirs(LOGS, exist_ok=True)

STEPS = [
    ("levers_c2c_1m", [sys.executable, "scripts/levers_bench.py", "c2c", "1000000"]),
    ("ingest_2m768", [sys.executable, "scripts/ingest_bench.py"]),
    ("scan_auto", [sys.executable, "scripts/scan_scaling.py", "2048", "128", "auto,binned"]),
    ("mfu_1m", [sys.executable, "scripts/scan_study_r3.py"]),
]

t0 = time.time()
for name, cmd in STEPS:
    log = os.path.join(LOGS, f"{name}_r5.log")
    print(f"=== {name} start t+{time.time()-t0:.0f}s -> {log}", flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    print(f"=== {name} done rc={rc} t+{time.time()-t0:.0f}s", flush=True)
print(f"=== chain complete t+{time.time()-t0:.0f}s", flush=True)
