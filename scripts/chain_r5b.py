"""Round-5 chip chain, part 2: wait for the levers run to release the chip
(one chip client at a time — a second client can crash the TPU worker), then
run the verify drive for this round's library changes followed by the
remaining VERDICT-r4 measurements.

Usage: nohup python scripts/chain_r5b.py <levers_pid> > logs/chain_r5b.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")
os.makedirs(LOGS, exist_ok=True)
PY = sys.executable

STEPS = [
    # (name, cwd, cmd) — verify runs from /tmp per the verify skill (library
    # surface: import from outside the repo)
    ("verify_r5", "/tmp", [PY, os.path.join(REPO, "scripts/verify_r5.py")]),
    ("ingest_2m768", REPO, [PY, "scripts/ingest_bench.py"]),
    ("scan_auto", REPO, [PY, "scripts/scan_scaling.py", "2048", "128", "auto,binned"]),
    ("mfu_1m", REPO, [PY, "scripts/scan_study_r3.py"]),
]


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


t0 = time.time()
if len(sys.argv) > 1:
    wait_pid = int(sys.argv[1])
    while pid_alive(wait_pid):
        time.sleep(20)
    print(f"=== pid {wait_pid} exited t+{time.time()-t0:.0f}s", flush=True)
    time.sleep(10)  # let the chip grant release cleanly

for name, cwd, cmd in STEPS:
    log = os.path.join(LOGS, f"{name}_r5.log")
    print(f"=== {name} start t+{time.time()-t0:.0f}s -> {log}", flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=cwd, stdout=fh, stderr=subprocess.STDOUT)
    print(f"=== {name} done rc={rc} t+{time.time()-t0:.0f}s", flush=True)
print(f"=== chain complete t+{time.time()-t0:.0f}s", flush=True)
