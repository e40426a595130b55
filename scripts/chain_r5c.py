"""Round-5 chip chain, part 3: wait for the ingest run to release the chip,
then run the MFU/roofline study FIRST (the older open verdict item), then
the scan-auto confirmation.  One chip client at a time.

Usage: nohup python scripts/chain_r5c.py <ingest_pid> > logs/chain_r5c.log 2>&1 &
"""
import os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")
PY = sys.executable

STEPS = [
    ("mfu_1m", [PY, "scripts/scan_study_r3.py"]),
    ("scan_auto", [PY, "scripts/scan_scaling.py", "2048", "128", "auto,binned", "2,8"]),
]

def pid_alive(pid):
    try:
        os.kill(pid, 0); return True
    except OSError:
        return False

t0 = time.time()
if len(sys.argv) > 1:
    wait_pid = int(sys.argv[1])
    while pid_alive(wait_pid):
        time.sleep(20)
    print(f"=== pid {wait_pid} exited t+{time.time()-t0:.0f}s", flush=True)
    time.sleep(10)

for name, cmd in STEPS:
    log = os.path.join(LOGS, f"{name}_r5.log")
    print(f"=== {name} start t+{time.time()-t0:.0f}s -> {log}", flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    print(f"=== {name} done rc={rc} t+{time.time()-t0:.0f}s", flush=True)
print(f"=== chain complete t+{time.time()-t0:.0f}s", flush=True)
