"""Repro: axon backend init hangs FOREVER (SIGINT-proof) on a wedged worker.

Finding (2026-08-18): when the axon remote worker is wedged (e.g. after a
client was SIGTERM-killed mid-compile — the NOTES_r1 pitfall), any process
whose effective ``jax_platforms`` selects axon blocks inside
``xla_client.make_c_api_client`` at first backend use:

* the main thread sits in an uninterruptible C retry loop
  (``hrtimer_nanosleep`` + an epoll thread — observed via /proc/<pid>/task/
  */wchan); SIGINT/KeyboardInterrupt never fires — only SIGKILL works;
* there is no timeout or error path: the caller hangs for hours.

Two compounding traps this repro demonstrates:

1. ``jax.config.update('jax_platforms', 'cpu')`` is NOT sticky against the
   environment on this machine: the shell exports ``JAX_PLATFORMS=axon``,
   and any code that (reasonably) honors that env var — e.g. this repo's
   ``__graft_entry__._honor_platform_env()``, which exists so the driver
   can steer the platform — re-applies it after your update, silently
   routing the process back onto the hanging init.
2. Because the hang is pre-backend, EVERY API surface is affected the same
   way: ``jax.devices()``, the first eager op, the first jit call.

Expected output on a healthy worker: the device list, well under the
timeout. Expected output on a wedged worker: ``WATCHDOG: backend init
still blocked after 60s — worker wedged`` and exit code 3 (the watchdog
thread pattern bench.py ships; without it, the process never returns).

Suggested upstream fix: a connect/claim timeout (env-settable) in the
axon PJRT client factory, surfacing as a normal RuntimeError through
``_init_backend``'s error path instead of an unbounded retry loop.
"""

import json
import os
import sys
import threading

TIMEOUT_S = float(os.environ.get("REPRO_TIMEOUT", 60))


def main():
    import jax

    ready = threading.Event()

    def watchdog():
        if not ready.wait(TIMEOUT_S):
            print(
                f"WATCHDOG: backend init still blocked after "
                f"{TIMEOUT_S:.0f}s - worker wedged",
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    print(
        f"jax_platforms={jax.config.jax_platforms!r} "
        f"JAX_PLATFORMS={os.environ.get('JAX_PLATFORMS')!r}; "
        f"calling jax.devices()...",
        flush=True,
    )
    devs = jax.devices()
    ready.set()
    print(json.dumps({"devices": [str(d) for d in devs]}))


if __name__ == "__main__":
    sys.exit(main())
