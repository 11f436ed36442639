"""Quiet-window watcher: probe the host every few minutes; when the
delivered-parallelism gate clears (see probe_host.py calibration), fire ONE
``bench.py --scaling`` run at the primary (8,32) levels and save its output.

Used at the end of round 3 to catch a quiet window for the north-rule
(8,32) headline without hand-babysitting the probe; exits after the first
successful scaling run or when ``--deadline`` seconds elapse.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> tuple[float, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "probe_host.py")],
        capture_output=True, text=True, timeout=120).stdout
    line = out.strip().splitlines()[0]
    eff = float(line.split("effective_cores=")[1].split()[0])
    steal = float(line.split("steal=")[1].split("%")[0])
    return eff, steal


def main() -> None:
    deadline = time.time() + float(sys.argv[sys.argv.index("--deadline") + 1]) \
        if "--deadline" in sys.argv else time.time() + 3600
    out_path = "/tmp/scaling_watch_result.json"
    while time.time() < deadline:
        try:
            eff, steal = probe()
        except Exception as exc:  # probe itself squeezed out — host busy
            print(f"probe failed: {exc}", flush=True)
            time.sleep(180)
            continue
        print(f"probe: eff_cores={eff:.1f} steal={steal:.1f}%", flush=True)
        # Fire gate raised round 4: the (8,32) ratio is work-conserving, so
        # measured efficiency ≈ delivered_cores/32 whenever the hypervisor
        # caps below 32 — a 24-core window mathematically cannot show ≥0.8.
        # Only fire when the probe sees ≥27 effective cores.
        if eff >= 27 and steal < 1:
            print("QUIET — firing bench.py --scaling (8,32)", flush=True)
            # The bench run itself can be squeezed out mid-flight (timeout,
            # OOM-kill); a failure must put the watcher back in the loop, not
            # kill it, and must not clobber a previous good result file.
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                    capture_output=True, text=True, cwd=REPO, timeout=3000)
            except (subprocess.TimeoutExpired, Exception) as exc:
                print(f"scaling run failed: {exc}", flush=True)
                time.sleep(180)
                continue
            print(r.stdout.strip().splitlines()[-1] if r.stdout else r.stderr[-500:],
                  flush=True)
            if r.returncode == 0:
                open(out_path, "w").write(r.stdout)
                return
        time.sleep(180)
    print("deadline reached without a quiet window", flush=True)
    json.dump({"quiet_window": False}, open(out_path, "w"))


if __name__ == "__main__":
    main()
