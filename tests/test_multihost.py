"""Multi-host (multi-process) distributed execution without a TPU pod.

The reference needs real MPI for any multi-node run (SURVEY.md §4 item 5);
here two OS processes with 2 CPU devices each form a 4-device global mesh
via jax.distributed (Gloo collectives) and run the m-sharded SHT and the
sharded amplitude CG against replicated references.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_sht_and_cg():
    port = _free_port()
    nproc = 2
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "commander_tpu.parallel.multihost",
         str(pid), str(nproc), f"localhost:{port}"],
        env=env, cwd="/root/repo", stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert "MULTIHOST OK" in out, out[-2000:]


def test_four_process_mesh():
    # beyond-2-process demo: 4 OS processes x 2 devices = 8 global devices;
    # the worker runs the m-sharded SHT, the sharded CG, and the 2-D
    # band x sphere CG over the full 8-device multi-host mesh
    port = _free_port()
    nproc = 4
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "commander_tpu.parallel.multihost",
         str(pid), str(nproc), f"localhost:{port}"],
        env=env, cwd="/root/repo", stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert "MULTIHOST OK" in out, out[-2000:]
