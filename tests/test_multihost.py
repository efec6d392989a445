"""Two-process multi-host structural test (VERDICT r4 next #7).

Spawns 2 coordinated worker processes (4 virtual CPU devices each) via
``python -m cuda_matrix_inversion_tpu.parallel.multihost``; each joins
the global runtime with ``jax.distributed.initialize``, feeds only its
process-local rows into a globally-sharded batch, inverts over the
8-device global mesh, and verifies its OWN addressable shards.  Kept
out of the driver's ``dryrun_multichip`` contract by design (that stays
single-process).

The workers are fresh subprocesses, so this test is immune to (and
cannot pollute) the suite's own JAX backend state.
"""

import os
import socket
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh():
    port = _free_port()
    env = dict(os.environ)
    # the workers pin their own platform/flags before importing jax;
    # scrub inherited settings so the suite's 8-device flag doesn't leak
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "cuda_matrix_inversion_tpu.parallel.multihost",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            cwd=REPO_ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} rc={p.returncode}:\n{out}"
        assert "MULTIHOST_OK" in out, f"process {i} output:\n{out}"
        # each process verifies half the global batch (8 of 16 rows)
        assert "checked_rows=8" in out, out
