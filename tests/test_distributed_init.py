"""Multi-host entry point (parallel.init_distributed): single-process
bring-up must produce the global row mesh.  Real multi-process runs need
multiple hosts (BASELINE.md scale-out protocol); this pins the bring-up
path in a subprocess so the coordinator doesn't pollute the test runner."""

import subprocess
import sys

CODE = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from multistark_tpu import parallel as par
pm = par.init_distributed(
    num_processes=1, process_id=0, coordinator_address="127.0.0.1:61124"
)
assert pm.n == 8 and pm.log_n == 3
assert jax.process_count() == 1
print("distributed-init-ok")
"""


def test_single_process_bringup():
    out = subprocess.run(
        [sys.executable, "-c", CODE], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "distributed-init-ok" in out.stdout
