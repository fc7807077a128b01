"""Run a command once the machine is quiet (hypervisor steal + co-tenant
CPU below thresholds for several consecutive samples).

The round-11 lesson: absolute bench numbers taken under host-level
co-tenancy (visible only via /proc/stat steal) are noise; rather than
discard measured runs after the fact, gate the expensive measurement on
a sustained quiet window.

Usage: python tools/run_when_quiet.py [--max-wait SEC] -- cmd arg...
Quiet = steal < 0.15 cores AND non-self busy < 1.5 cores, 3 samples of
10 s in a row. If --max-wait (default 3600) elapses first, the command
runs anyway and a warning goes to stderr (the caller's own load context
still records the truth).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def sample(interval: float = 10.0) -> tuple[float, float]:
    def read():
        f = open("/proc/stat").readline().split()
        total = sum(int(x) for x in f[1:])
        idle = int(f[4]) + int(f[5])
        steal = int(f[8])
        return total, idle, steal

    t0, i0, s0 = read()
    time.sleep(interval)
    t1, i1, s1 = read()
    dt = max(t1 - t0, 1) / (os.cpu_count() or 1)
    steal_cores = (s1 - s0) / dt
    busy_cores = ((t1 - t0) - (i1 - i0) - (s1 - s0)) / dt
    return steal_cores, busy_cores


def main() -> int:
    args = sys.argv[1:]
    max_wait = 3600.0
    if args and args[0] == "--max-wait":
        max_wait = float(args[1])
        args = args[2:]
    if args and args[0] == "--":
        args = args[1:]
    deadline = time.time() + max_wait
    quiet_streak = 0
    while quiet_streak < 3:
        steal, busy = sample()
        print(
            f"[quiet-gate] steal={steal:.2f} busy={busy:.2f} streak={quiet_streak}",
            file=sys.stderr,
            flush=True,
        )
        if steal < 0.15 and busy < 1.5:
            quiet_streak += 1
        else:
            quiet_streak = 0
        if time.time() > deadline:
            print(
                "[quiet-gate] max-wait elapsed, running anyway",
                file=sys.stderr,
                flush=True,
            )
            break
    return subprocess.call(args)


if __name__ == "__main__":
    sys.exit(main())
