#!/usr/bin/env python
"""Round-5 TPU backend watcher.

Probes backend init in a fresh subprocess every PROBE_INTERVAL seconds; on
the first successful `jax.devices()` it launches experiments/queue_r5.sh
(the unattended chip queue) and exits. Mirrors the round-4 watcher
(experiments/TPU_OUTAGE_r4.md) which never saw a live backend across 48
consecutive 600-s init hangs.

Logs every attempt to /tmp/tpu_probe_r5.log. Run detached:
    nohup python experiments/tpu_watch_r5.py > /tmp/tpu_watch_r5.out 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = "/tmp/tpu_probe_r5.log"
PROBE_TIMEOUT = 600
PROBE_INTERVAL = 60  # sleep between attempts (on top of probe duration)
MAX_ATTEMPTS = 400

PROBE_SRC = (
    "import jax, time; t0=time.time(); d=jax.devices(); "
    "print('DEVICES', d, '%.1fs' % (time.time()-t0)); "
    "import sys; sys.exit(0 if d else 1)"
)


def log(msg: str) -> None:
    line = f"[watch {time.strftime('%m-%d %H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe() -> tuple[int, str]:
    env = dict(os.environ)
    # never overwrite PYTHONPATH wholesale: /root/.axon_site registers the
    # TPU backend plugin
    env["PYTHONPATH"] = REPO + ":/root/.axon_site:" + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT, env=env,
        )
        out = (r.stdout + r.stderr).strip()
        return r.returncode, out[-500:]
    except subprocess.TimeoutExpired:
        return -1, f"probe timed out after {PROBE_TIMEOUT}s (init hang)"


def main() -> None:
    deadline_ts = os.environ.get("SMOKE_DEADLINE_TS", "")
    for attempt in range(1, MAX_ATTEMPTS + 1):
        rc, out = probe()
        log(f"attempt {attempt}: rc={rc} :: {out}")
        if rc == 0 and "DEVICES" in out and "cpu" not in out.lower():
            log("backend LIVE - launching queue_r5.sh")
            env = dict(os.environ)
            if deadline_ts:
                env["SMOKE_DEADLINE_TS"] = deadline_ts
            with open("/tmp/r5_queue_runner.log", "ab") as qlog:
                p = subprocess.Popen(
                    ["bash", os.path.join(REPO, "experiments", "queue_r5.sh")],
                    stdout=qlog, stderr=qlog, env=env,
                    start_new_session=True, cwd=REPO,
                )
            with open("/tmp/queue_r5.pid", "w") as f:
                f.write(str(p.pid))
            time.sleep(10)
            if p.poll() is not None and p.returncode != 0:
                log(f"queue died immediately rc={p.returncode}; keep watching")
                continue
            log(f"queue launched pid={p.pid}; watcher exiting")
            return
        time.sleep(PROBE_INTERVAL)
    log("max attempts reached; giving up")


if __name__ == "__main__":
    main()
