"""Examples must keep running end-to-end (they are the documented user
journeys; the verify recipe drives them).  Subprocess-per-example on the
CPU backend; gated behind MULTISTARK_SLOW — several minutes total."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MULTISTARK_SLOW") != "1",
    reason="example runs take minutes on CPU; set MULTISTARK_SLOW=1",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("simple_proof.py", "Proof size"),
    ("preprocessed_proof.py", "Proof size"),
    ("lookup_proof.py", "Wrong claim rejected"),
    ("pcs_example.py", ""),
    ("blake3_proof.py", "Tampered digest rejected"),
    ("sharded_proof.py", "bytes identical"),
]


@pytest.mark.parametrize("name,needle", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(name, needle):
    env = dict(os.environ, MULTISTARK_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # sharded_proof sets its own virtual mesh
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name)],
        capture_output=True, text=True, timeout=900, cwd=ROOT, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert needle in out.stdout
