"""Real multi-process multi-host exercise (2 processes, CPU backend).

SURVEY §2.3 makes multi-host first-class; this drives the actual
bootstrap path: two OS processes join through
``jax.distributed.initialize`` (coordinator + worker), each contributes
2 fake CPU devices (4 global), loads only its host-local shard of the
global batch (``DataLoader(shard_index=process_index)`` — the same
strided sharding the train CLIs wire up), assembles a globally-sharded
array with ``jax.make_array_from_process_local_data``, and computes a
jitted global masked metric whose value must equal the single-process
computation over the full batch (the batch mean under jit inserts the
cross-host all-reduce).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from esmstereo_tpu.parallel import distributed as dist
from esmstereo_tpu.parallel import mesh as pmesh
from esmstereo_tpu.data.loader import DataLoader
from esmstereo_tpu.utils.metrics import epe_metric

pid = int(sys.argv[1])
coord = sys.argv[2]
info = dist.initialize(coord, 2, pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info
dist.assert_same_across_hosts(np.int32(192), "max_disp")

# deterministic synthetic "dataset": disparity maps keyed by sample index
class DispDataset:
    def __len__(self):
        return 8

    def get(self, i, rng):
        g = np.random.default_rng(i)  # index-keyed, host-independent
        return {{"disparity": g.uniform(1.0, 40.0, (16, 24)).astype(
                     np.float32),
                 "estimate": np.full((16, 24), float(i), np.float32)}}

loader = DataLoader(DispDataset(), batch_size=4, num_workers=2,
                    shard_index=info["process_index"], num_shards=2)
local = next(iter(loader))  # this host's 4 samples of the global 8

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))
g_est = jax.make_array_from_process_local_data(sharding,
                                               local["estimate"])
g_gt = jax.make_array_from_process_local_data(sharding,
                                              local["disparity"])

@jax.jit
def global_epe(est, gt):
    mask = (gt > 0) & (gt < 192)
    return epe_metric(est, gt, mask)

val = float(global_epe(g_est, g_gt))
print("RESULT " + json.dumps({{"pid": pid, "epe": val}}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_metric(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), coord],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out, err)
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r["epe"]
    assert set(results) == {0, 1}, outs
    # all-reduced metric is identical on both hosts
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # single-process ground truth over the full 8-sample global batch,
    # strided-interleaved exactly as the two host shards are laid out on
    # the (data,) mesh: device order is host0's 2 devices then host1's,
    # so the global batch is [host0 samples, host1 samples] =
    # [0,2,4,6,1,3,5,7]
    est, gt = [], []
    for i in [0, 2, 4, 6, 1, 3, 5, 7]:
        g = np.random.default_rng(i)
        gt.append(g.uniform(1.0, 40.0, (16, 24)).astype(np.float32))
        est.append(np.full((16, 24), float(i), np.float32))
    est, gt = np.stack(est), np.stack(gt)
    mask = (gt > 0) & (gt < 192)
    # epe_metric semantics: per-image masked mean, batch-averaged with
    # degenerate-mask skip (utils/metrics.py)
    per_img = [np.abs(e - g)[m].mean() for e, g, m in zip(est, gt, mask)]
    expected = float(np.mean(per_img))
    assert results[0] == pytest.approx(expected, rel=1e-5)
