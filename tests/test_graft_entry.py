"""Driver-boundary tests for __graft_entry__.py.

Round-1 failure mode (MULTICHIP_r01.json): dryrun_multichip assumed the
caller had configured a virtual device mesh; the driver calls it in a fresh
process under the default environment (axon platform, ONE real device) and it
raised. These tests invoke the entry points exactly as the driver does — a
fresh subprocess with the repo's default environment — so the boundary itself
is what's under test.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The environment the driver runs in: default env WITHOUT the virtual
    8-device XLA_FLAGS that tests/conftest.py injects into this process."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_as_driver():
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g\n"
         "g.dryrun_multichip(8)\n"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=1800,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "ok" in r.stdout


@pytest.mark.slow
def test_entry_compiles_as_driver():
    # The driver compile-checks entry() single-chip. On CPU here (no real
    # TPU assumption in tests); jax.jit(...).lower(...).compile() is the
    # driver's documented check.
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax\n"
         "jax.config.update('jax_platforms', 'cpu')\n"
         "import __graft_entry__ as g\n"
         "fn, args = g.entry()\n"
         "out = jax.jit(fn)(*args)\n"
         "jax.tree.map(lambda x: x.block_until_ready(), out)\n"
         "import jax.numpy as jnp\n"
         "assert out['pose'].shape == (4, 4), out['pose'].shape\n"
         "assert bool(jnp.all(jnp.isfinite(out['pose']))), 'non-finite pose'\n"
         "print('entry ok')\n"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True,
        timeout=1800,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
