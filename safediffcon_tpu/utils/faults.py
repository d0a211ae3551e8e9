"""Device-fault recovery: survive a TPU worker crash mid-phase.

The reference has no equivalent (its GPU runs die and are restarted by
hand); on a tunneled TPU a long 2D program can lose the worker
("UNAVAILABLE: TPU worker process crashed or restarted", observed three
times in round 3 — experiments/smoke_backward_crash_round3.log). The
epoch-granular phase state (utils/checkpoint.py save_phase_state) already
makes a *process* restart bit-identical; this module makes the recovery
happen inside the process: detect the fault, drop the dead PJRT client,
let the plugin factory reconnect, and re-enter the phase loop, which
resumes from the last persisted epoch.
"""
from __future__ import annotations

import logging
import re
import time
from typing import Callable, TypeVar

import jax

log = logging.getLogger(__name__)

T = TypeVar("T")

# Phrases identifying a *device/backend* loss (retryable) as opposed to a
# program error (not retryable), and the PJRT/gRPC status codes a dead
# backend surfaces with. Codes must appear in `CODE:` status position, not
# anywhere in the text, so a user-level error that merely mentions
# "DEADLINE_EXCEEDED" in its payload does not trigger a backend teardown.
_FAULT_PHRASES = (
    "worker process crashed",
    "backend setup/compile error",
)
_STATUS_CODES = ("UNAVAILABLE", "DEADLINE_EXCEEDED")
_STATUS_RE = re.compile(r"\b(?:" + "|".join(_STATUS_CODES) + r"): ")


def is_device_fault(exc: BaseException) -> bool:
    """True when `exc` looks like a lost/crashed device backend.

    Two accepted shapes (tightened per round-4 VERDICT):
      - a `jax.errors.JaxRuntimeError` (the XLA/PJRT runtime exception)
        carrying a fault phrase or a `CODE: ` status prefix — this is how a
        mid-run worker loss surfaces;
      - a plain RuntimeError ONLY for jax's backend-init failure signature
        ("Unable to initialize backend ...: UNAVAILABLE: ...", raised by
        xla_bridge before any JaxRuntimeError exists).
    Any other RuntimeError — including ones whose payload mentions a status
    code — is a program error and is NOT retried.
    """
    msg = str(exc)
    if isinstance(exc, jax.errors.JaxRuntimeError):
        return any(p in msg for p in _FAULT_PHRASES) or bool(
            _STATUS_RE.search(msg))
    if isinstance(exc, RuntimeError):
        return "Unable to initialize backend" in msg and bool(
            _STATUS_RE.search(msg))
    return False


def reinit_backend() -> None:
    """Tear down the dead PJRT client so the next dispatch reconnects.

    `jax.extend.backend.clear_backends()` drops the cached client and all
    live executables; `jax.clear_caches()` evicts every jitted function's
    compiled entry so the next call re-lowers against the fresh client
    (re-compiles hit the persistent compilation cache, so this is seconds,
    not the original compile time). Device arrays created before the fault
    are invalid afterwards — callers must reload state from host/checkpoint,
    which the phase-state resume path already does.
    """
    import jax.extend.backend as jeb

    jeb.clear_backends()
    jax.clear_caches()


def resilient_phase(
    make_pipeline,
    run: Callable,
    params,
    retries: int = 2,
    backoff_s: float = 30.0,
    describe: str = "phase",
):
    """Run a finetune phase with device-fault recovery.

    `run(pipeline, params_host)` executes the phase; on a worker crash the
    backend is re-initialized and the phase re-entered with a FRESH
    pipeline from `make_pipeline()` — the old pipeline's jitted programs
    capture device-resident constants (schedule tables, solver masks) that
    die with the backend. `params` is snapshotted to host once so no retry
    depends on dead buffers. Phases that persist epoch state (`state_dir`)
    resume bit-identically; others replay from epoch 0 (correct, wasteful).
    """
    params_host = jax.device_get(params)
    return retry_on_device_fault(
        lambda: run(make_pipeline(), params_host),
        retries=retries, backoff_s=backoff_s, describe=describe)


def retry_on_device_fault(
    fn: Callable[[], T],
    retries: int = 2,
    backoff_s: float = 30.0,
    describe: str = "phase",
) -> T:
    """Run `fn()`; on a device-fault error, re-init the backend and re-call.

    `fn` must be written to resume from persisted state when re-entered
    (e.g. `run_inference` with a `state_dir`): each retry costs at most the
    work since the last persisted epoch. Non-fault exceptions propagate
    immediately; after `retries` faults the last one propagates.
    """
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by is_device_fault
            if not is_device_fault(e) or attempt == retries:
                raise
            log.warning(
                "%s: device fault (attempt %d/%d): %s — reinitializing "
                "backend and resuming from persisted state in %.0fs",
                describe, attempt + 1, retries, str(e).splitlines()[0][:200],
                backoff_s,
            )
            time.sleep(backoff_s)
            reinit_backend()
    raise AssertionError("unreachable")
