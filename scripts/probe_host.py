"""Host-quietness probe for timed benchmark runs on this shared VM.

Burns all 32 CPUs for ~2s and reports:
  - steal%: hypervisor CPU theft from /proc/stat during the burn
  - slowdown: median worker time vs a single-thread reference
  - effective cores: total CPU work done / wall time — the number of
    physical cores the hypervisor actually delivered.

Calibration (2026-08-17): in a genuinely quiet window this VM delivers
~25-30 effective cores (SMT pairs shared); during the day-long noisy
stretch it delivered ~14-19 while per-leg steal stayed under 7% — so
EFFECTIVE CORES is the discriminating go/no-go signal, not steal alone.
A 32-cpu bench leg is only meaningful when the verdict is QUIET.
"""
import multiprocessing as mp
import time


def burn(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x += i * i
    return time.perf_counter() - t0


def snap():
    f = open("/proc/stat").readline().split()
    v = list(map(int, f[1:]))
    return sum(v), v[7] if len(v) > 7 else 0


if __name__ == "__main__":
    import statistics

    ref = min(burn(0), burn(0))
    t0, s0 = snap()
    w0 = time.perf_counter()
    with mp.Pool(32) as p:
        times = p.map(burn, range(32))
    wall = time.perf_counter() - w0
    t1, s1 = snap()
    steal = 100 * (s1 - s0) / max(1, (t1 - t0))
    med = statistics.median(times)
    eff_cores = 32 * ref / wall
    print(f"ref={ref:.3f}s med_worker={med:.3f}s slowdown={med/ref:.2f}x "
          f"wall={wall:.2f}s effective_cores={eff_cores:.1f} "
          f"steal={steal:.1f}% load1={open('/proc/loadavg').read().split()[0]}")
    print("QUIET" if eff_cores >= 24 and steal < 3 else "NOISY")
