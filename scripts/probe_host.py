"""Host-quietness probe: burn 32 CPUs ~2s, report steal% + parallel efficiency."""
import time, multiprocessing as mp

def burn(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x += i * i
    return time.perf_counter() - t0

def snap():
    f = open('/proc/stat').readline().split()
    v = list(map(int, f[1:]))
    return sum(v), v[7]

if __name__ == "__main__":
    # single-thread reference
    ref = burn(0)
    t0, s0 = snap()
    w0 = time.perf_counter()
    with mp.Pool(32) as p:
        times = p.map(burn, range(32))
    wall = time.perf_counter() - w0
    t1, s1 = snap()
    steal = 100 * (s1 - s0) / max(1, (t1 - t0))
    # parallel efficiency: each worker should take ~ref if host quiet
    import statistics
    med = statistics.median(times)
    print(f"ref={ref:.3f}s med_worker={med:.3f}s slowdown={med/ref:.2f}x "
          f"wall={wall:.2f}s steal={steal:.1f}% load1={open('/proc/loadavg').read().split()[0]}")
    print("QUIET" if med/ref < 1.35 and steal < 5 else "NOISY")
