"""Regression: two-shape retrace of localize_forward in a FRESH process.

BENCH_r04 died with an UnexpectedTracerError because `solve/pnp.py` held
module-level `jnp.array` constants and `pose_estimator.localize_forward`
imported it lazily *inside* the first jit trace: the constants were created
as tracers of that trace and leaked into the second trace (different V).
The suite never caught it because conftest/other tests import pnp eagerly —
so this test spawns a clean interpreter where the first import of every
lazily-reachable module happens exactly where production (bench.py,
__graft_entry__.entry) triggers it: under jit.

Guards two invariants:
  1. no module reachable from a jitted trace creates jnp arrays at import
     time (they must be numpy — see solve/pnp.py:_P3P_NODES comment);
  2. localize_forward retraces cleanly at a second batch shape.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

cfg = Config(
    backbone2d_fpn_dim=16,
    model_3d_hidden_dim=16,
    matcher_hidden_dim=24,
    render=RenderConfig(N_samples=4, N_rand=8),
    matching=MatchingConfig(fine_num_3d_keypoints=16,
                            coarse_num_3d_keypoints=16),
)
model = NerfPoseEstimator(cfg)
rng = jax.random.PRNGKey(0)


def localize(params, batch, rng):
    return model.apply(params, batch, rng, method=model.localize_forward)


def run(n_views, seed):
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=n_views, H=32, W=32,
                                           seed=seed)).items()}
    params = jax.jit(model.init)(rng, batch, rng)
    out = jax.jit(localize)(params, batch, rng)
    assert out['pose'].shape == (4, 4)
    return out


# trace 1 at V=2: any lazy import under this trace that builds module-level
# jnp constants poisons them with THIS trace's tracers ...
run(2, seed=0)
# ... and trace 2 at V=3 (new shape -> new trace) then explodes with
# UnexpectedTracerError. Both must succeed.
run(3, seed=1)
print('RETRACE_OK')
"""


def test_localize_two_shape_retrace_fresh_process():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", _SCRIPT], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "RETRACE_OK" in r.stdout
