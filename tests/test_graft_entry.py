"""The driver gates, exercised exactly as the driver runs them.

``dryrun_multichip(8)`` aborted in rounds 1-2 with failures pytest never
saw (round 2: XLA-CPU's ~40 s collective-rendezvous termination on the
1-CPU eval host) because the tests validated the *components* on the same
mesh but never ran the *gate program* itself.  This runs the real entry
file as a subprocess, the way the driver does.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    # mimic the driver: virtual CPU devices, no axon plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ) or REPO
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "__graft_entry__.py"),
            "--dryrun",
            "8",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "OK" in proc.stdout
