"""Multi-process runtime bring-up: `jax.distributed.initialize` over 2 CPU
processes with cross-process collectives (the multi-HOST code path of
SURVEY §5's comm backend; Gloo here, ICI/DCN on a real slice)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_bringup():
    env = dict(os.environ)
    # the launcher's workers pin their own platform; scrub the virtual-mesh
    # flag so each process sees exactly one CPU device
    flags = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "launch_distributed.py"),
         "--port", "9411"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "2/2 workers ok" in out.stdout
