"""Timeboxed smoke test of the driver's graded multichip dryrun entrypoint.

MULTICHIP_r04 regressed to rc=124 because ungraded extras appended to
`__graft_entry__.dryrun_multichip` wedged an XLA:CPU AllToAll; this test runs
the ACTUAL entrypoint in a subprocess under the driver's own invocation shape
(virtual CPU devices via XLA_FLAGS) with a hard timeout, so any future wedge
fails the default suite instead of the round artifact.
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("ZEROG_DRYRUN_TIMING", None)
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(4)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (
        f"dryrun failed rc={res.returncode}\nstdout:{res.stdout[-2000:]}\n"
        f"stderr:{res.stderr[-2000:]}")
    assert "full mesh proving step OK" in res.stdout
    assert '"scaling_proxy"' in res.stdout
