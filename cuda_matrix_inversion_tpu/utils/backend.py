"""Backend pinning and first-device-contact watchdog for the CLIs.

Two hard-won facts about this class of TPU environment (VERDICT r2 weak #3):

1. ``JAX_PLATFORMS=cpu`` set in the *environment* does NOT reliably stop
   the TPU plugin from initializing — on the axon tunnel a CPU-intended
   run still opens the tunnel and can hang for minutes.  The config-API
   pin (``jax.config.update("jax_platforms", "cpu")``) applied before any
   device touch works (2.6 s measured vs >60 s hang); it is what
   ``tests/conftest.py`` uses.  :func:`pin_backend` exposes that as a CLI
   flag.

2. The tunnel can wedge for multiple minutes, during which the first
   ``jax.devices()`` (or first compile) blocks indefinitely with no
   feedback.  The reference never faced this — ``cudaGetDevice`` fails
   fast — so :func:`first_contact_watchdog` restores a bounded-time
   failure mode: if the wrapped block doesn't finish within the window,
   print an actionable diagnostic and exit.

Reference analog: ``gpuErrchk`` aborts on the first CUDA error
(``include/helper_gpu.h:9-18``); this module is the TPU-environment
equivalent for the errors that manifest as hangs instead of codes.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading

#: exit code for "device contact timed out" — distinct from argparse (2)
#: and from ordinary failures (1) so drivers can tell a tunnel outage
#: from a real error.
WATCHDOG_EXIT_CODE = 17

#: default seconds allowed for the first device contact (backend init is
#: seconds when healthy; first remote compiles are 20-40 s — callers
#: wrapping a compile should pass a larger value or set
#: CMI_DEVICE_TIMEOUT_S).
DEFAULT_TIMEOUT_S = 120.0


def backend_argument(parser) -> None:
    """Add the standard ``--backend`` flag to an argparse parser."""
    parser.add_argument(
        "--backend", default="auto", choices=["auto", "cpu"],
        help="auto = whatever JAX picks (the TPU on this machine — its "
             "platform is named 'axon', so there is deliberately no "
             "'tpu' choice: pinning jax_platforms='tpu' would fail "
             "backend init here); cpu = hard-pin the CPU backend via "
             "the config API (the env-var pin does not stop the TPU "
             "plugin here)")


def pin_backend(backend: str) -> None:
    """Apply the backend pin. Must run before any jax device touch."""
    if backend in (None, "auto"):
        return
    import jax

    jax.config.update("jax_platforms", backend)


def _timeout_s(timeout_s: float | None) -> float:
    if timeout_s is not None:
        return timeout_s
    return float(os.environ.get("CMI_DEVICE_TIMEOUT_S", DEFAULT_TIMEOUT_S))


@contextlib.contextmanager
def first_contact_watchdog(timeout_s: float | None = None,
                           what: str = "first device contact",
                           on_timeout=None):
    """Abort the process with a diagnostic if the wrapped block (typically
    the first ``jax.devices()`` / first jit execution) exceeds the window.

    Uses ``os._exit`` from a daemon thread because the hang sits inside a
    C extension waiting on the tunnel — no Python-level exception can
    interrupt it.  ``on_timeout`` (optional) runs before exit — e.g.
    bench.py flushes its best-so-far JSON line there.
    """
    limit = _timeout_s(timeout_s)
    done = threading.Event()

    def fire():
        if not done.wait(limit):
            sys.stderr.write(
                f"\nERROR: {what} did not complete within {limit:.0f}s.\n"
                "The TPU tunnel is likely wedged (known failure mode of this "
                "environment; it can last minutes).\n"
                "  - retry later, polling: timeout 100 python -c "
                "\"import jax; print(jax.devices())\"\n"
                "  - or run on CPU: --backend cpu "
                "(env CMI_DEVICE_TIMEOUT_S adjusts this window)\n")
            sys.stderr.flush()
            if on_timeout is not None:
                try:
                    on_timeout()
                except Exception:
                    pass
            os._exit(WATCHDOG_EXIT_CODE)

    t = threading.Thread(target=fire, daemon=True, name="cmi-device-watchdog")
    t.start()
    try:
        yield
    finally:
        done.set()


def touch_devices(timeout_s: float | None = None):
    """Bounded-time ``jax.devices()`` — the standard CLI startup call."""
    import jax

    with first_contact_watchdog(timeout_s, what="jax.devices()"):
        return jax.devices()
