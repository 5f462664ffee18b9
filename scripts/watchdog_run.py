"""Stall watchdog for long TPU jobs (VERDICT r4 #9 — the tunnel-stall tax).

The measured failure mode is RARE LONG HANGS, not frequent small stalls:
the r4 Mip-BARF 200k run lost 29 of its 175 minutes (16.8%) to a single
~30-minute device hang at steps 44.3k-46.5k (stall analysis in RESULTS.md).
This wrapper runs a quality script as a child process group, watches the
run's metrics.jsonl for progress, and on a stall kills the child BY PID
(never by pattern) and restarts it with Q_RESUME=1 so the entry resumes
from the latest orbax checkpoint.

Usage:
  python scripts/watchdog_run.py --out-dir runs/x [--stall-sec 420]
      [--grace-sec 1500] [--max-restarts 3] -- <command...>

The command inherits the environment; restarts add Q_RESUME=1.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def _metrics_mtime(out_dir):
    p = os.path.join(out_dir, "metrics.jsonl")
    try:
        return os.path.getmtime(p)
    except OSError:
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--stall-sec", type=int, default=420,
                    help="kill+resume when metrics.jsonl stops moving this long")
    ap.add_argument("--grace-sec", type=int, default=1500,
                    help="startup grace before the first metrics row "
                         "(scene generation + compile)")
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- separated child command")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no child command given (pass it after --)")

    restarts = 0
    stalls = []
    while True:
        env = dict(os.environ)
        if restarts:
            env["Q_RESUME"] = "1"
        t_start = time.time()
        child = subprocess.Popen(cmd, env=env, start_new_session=True)
        print(f"[watchdog] started pid {child.pid} (restart {restarts})",
              flush=True)
        killed = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            mt = _metrics_mtime(args.out_dir)
            ref = mt if mt and mt > t_start else t_start
            limit = args.stall_sec if (mt and mt > t_start) else args.grace_sec
            idle = time.time() - ref
            if idle > limit:
                print(f"[watchdog] STALL: no progress for {idle:.0f}s "
                      f"(limit {limit}); killing pgid {child.pid}", flush=True)
                stalls.append(round(idle, 1))
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
                killed = True
                # let the wedged tunnel recover before reattaching
                time.sleep(120)
                break
            time.sleep(20)
        if not killed:
            print(f"[watchdog] child exited rc={rc}; stalls={stalls}",
                  flush=True)
            return rc
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[watchdog] giving up after {restarts - 1} restarts; "
                  f"stalls={stalls}", flush=True)
            return 75


if __name__ == "__main__":
    sys.exit(main())
