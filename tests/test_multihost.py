"""Multi-process eval gather (parallel/multihost.py) over real processes.

Spawns two coordinated CPU processes (jax.distributed.initialize on
localhost, gloo collectives) that each evaluate a strided shard of a fake
7-query test set and allgather the metric arrays — the mechanism the
multi-host eval path (train/evaluate.py) runs on TPU pods. Also unit-
covers the sharding/ordering helpers in-process.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np

from nerfloc_tpu.parallel.multihost import process_shard_indices

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    rank = int(sys.argv[1])
    jax.distributed.initialize("localhost:%%d" %% int(sys.argv[2]),
                               num_processes=2, process_id=rank)
    import numpy as np
    from nerfloc_tpu.parallel.multihost import (allgather_metrics,
                                                process_shard_indices)
    from nerfloc_tpu.train.evaluate import _decode_names, _encode_names

    N = 7
    idx = process_shard_indices(N)
    # fake per-query metrics derived from the global index so both ranks
    # can verify the merged result independently (pose + filename arrays
    # exercise the multi-process collect_poses gather path)
    local = {
        "rot": np.asarray([i * 1.0 for i in idx], np.float32),
        "pose": np.stack([np.full((2, 2), i, np.float32) for i in idx])
        if idx else np.zeros((0, 2, 2), np.float32),
        "fname": _encode_names([f"seq-01/frame-{i:06d}.png" for i in idx]),
    }
    g = allgather_metrics(local, idx, N)
    assert g["rot"].shape == (N,), g["rot"].shape
    assert np.allclose(g["rot"], np.arange(N)), g["rot"]
    assert g["pose"].shape == (N, 2, 2)
    assert np.allclose(g["pose"][:, 0, 0], np.arange(N))
    names = _decode_names(g["fname"])
    assert names == [f"seq-01/frame-{i:06d}.png" for i in range(N)], names
    print(f"rank {rank} OK", flush=True)
""") % (REPO,)


def test_process_shard_indices_cover_exactly_once():
    for n in (1, 2, 7, 8):
        for p in (1, 2, 3):
            all_idx = sorted(
                i for r in range(p)
                for i in process_shard_indices(n, rank=r, nprocs=p))
            assert all_idx == list(range(n))


def test_two_process_allgather(tmp_path):
    port = 12000 + (os.getpid() % 2000)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(rank), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for rank in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} OK" in out
