"""`import nfmc_tpu` must not initialize the JAX backend.

CLAUDE.md: the only reliable platform override in this environment is
`jax.config.update("jax_platforms", ...)` applied AFTER import — so any
module-level device-array constant (e.g. a `jnp.zeros` dataclass default or a
`jax.random.key` global) would lock the platform before user code can choose
it (and, through the axon tunnel, can stall import for minutes in bad phases).
Runs in a subprocess because the test process's own backend is already up.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHECK = """
import jax
assert not jax._src.xla_bridge._backends, "backend up before import?!"
import nfmc_tpu
assert not jax._src.xla_bridge._backends, (
    "import nfmc_tpu initialized the JAX backend")
print("CLEAN")
"""


def test_import_does_not_initialize_backend():
    r = subprocess.run(
        [sys.executable, "-c", CHECK],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": str(REPO)},
    )
    assert r.returncode == 0, r.stderr
    assert "CLEAN" in r.stdout
