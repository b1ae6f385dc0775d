"""REAL multi-process multi-host test: two OS processes join one
jax.distributed runtime (Gloo over localhost) with 4 virtual CPU devices
each and run a cross-process sharded NAND batch via GateSession — the
path tests/test_sharding.py can only exercise in its single-process
degenerate form (SURVEY.md §2.6: the reference has no distributed story;
this is the framework's own N-host capability)."""

import os
import socket
import subprocess
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_gate_session():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # the example's --cpu flag forces CPU
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "examples/multihost_gates.py",
                f"--coordinator=localhost:{port}",
                "--nprocs=2",
                f"--pid={pid}",
                "--cpu",
                "--test-params",
                "--batch-per-host=16",
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()  # exact PIDs we started, never by pattern
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-2000:]}"
        assert f"process {pid}/2: 4 local / 8 global devices" in out, out[-2000:]
        assert f"process {pid}: 16 local NANDs, correct=True" in out, out[-2000:]
