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


TRAIN_WORKER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

from esmstereo_tpu.data.synthetic import make_batch
from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
from esmstereo_tpu.parallel import distributed as dist
from esmstereo_tpu.parallel import mesh as pmesh
from esmstereo_tpu.train import checkpoints as ckpt
from esmstereo_tpu.train.state import create_train_state, make_optimizer
from esmstereo_tpu.train.step import make_train_step

pid = int(sys.argv[1])
coord = sys.argv[2]
logdir = sys.argv[3]
info = dist.initialize(coord, 2, pid)
assert info["global_devices"] == 4, info

mesh = pmesh.make_mesh(pmesh.MeshConfig(data=4, spatial=1))
cfg = ESMStereoConfig(cv_scale=16, backbone="mobilenetv2_100",
                      cost_volume="norm_correlation", use_pallas=False)
model = ESMStereo(config=cfg)

# identical global batch constructed on both hosts (seed-keyed), each host
# feeding only its contiguous device-order slice
gbatch = make_batch(np.random.default_rng(0), batch=4, h=64, w=64,
                    disp_range=(2, 8))
lo = 2 * info["process_index"]
bsh = pmesh.batch_sharding(mesh)

def to_global(x):
    if isinstance(x, list):
        return [to_global(e) for e in x]
    return jax.make_array_from_process_local_data(bsh, x[lo:lo + 2])

sharded = {{k: to_global(v) for k, v in gbatch.items()}}

# same seed + same (host-local full) init batch -> identical init on both
# hosts; promote to a replicated global state
state = create_train_state(model, jax.random.key(0), gbatch,
                           make_optimizer("adamw", 1e-3))
state = multihost_utils.host_local_array_to_global_array(state, mesh, P())

train_step = jax.jit(make_train_step(model))
state, metrics = train_step(state, sharded)

checksum = float(jax.jit(
    lambda p: sum(jnp.sum(jnp.abs(l))
                  for l in jax.tree_util.tree_leaves(p)))(state.params))
dist.assert_same_across_hosts(np.float32(checksum), "post-step params")

# multi-host checkpoint round trip through the shared logdir
path = ckpt.save_checkpoint(logdir, state, epoch=0)
fresh = create_train_state(model, jax.random.key(1), gbatch,
                           make_optimizer("adamw", 1e-3))
fresh = multihost_utils.host_local_array_to_global_array(fresh, mesh, P())
restored, next_epoch = ckpt.restore_checkpoint(path, fresh)
ok = bool(all(
    np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params))))
ok = ok and int(restored.step) == int(state.step)

print("RESULT " + json.dumps({{
    "pid": pid,
    "loss": float(metrics["loss"]),
    "EPE": float(metrics["EPE"]),
    "checksum": checksum,
    "restore_ok": ok,
    "next_epoch": next_epoch,
}}), flush=True)
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


def test_two_process_train_step_and_checkpoint(tmp_path):
    """SURVEY §2.3 first-class multi-host training: a 2-process sharded
    train step (model init, globally-sharded batch via
    make_array_from_process_local_data, gradient all-reduce under jit) with
    post-step params identical across hosts AND equal to the same step run
    single-process on an equivalent 4-device mesh, plus a multi-host
    orbax checkpoint save/restore round trip."""
    import jax
    import jax.numpy as jnp

    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER.format(repo=REPO))
    logdir = str(tmp_path / "ckpts")
    os.makedirs(logdir, exist_ok=True)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord, logdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
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
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs
    for pid in (0, 1):
        assert results[pid]["restore_ok"], results[pid]
        assert results[pid]["next_epoch"] == 1
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-6)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-process ground truth: same model, same global batch, same
    # init seed, one train step over an equivalent 4-device (data) mesh
    from esmstereo_tpu.data.synthetic import make_batch
    from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
    from esmstereo_tpu.parallel import mesh as pmesh
    from esmstereo_tpu.train.state import create_train_state, make_optimizer
    from esmstereo_tpu.train.step import make_train_step

    mesh = pmesh.make_mesh(pmesh.MeshConfig(data=4, spatial=1),
                           devices=jax.devices()[:4])
    cfg = ESMStereoConfig(cv_scale=16, backbone="mobilenetv2_100",
                          cost_volume="norm_correlation", use_pallas=False)
    model = ESMStereo(config=cfg)
    gbatch = make_batch(np.random.default_rng(0), batch=4, h=64, w=64,
                        disp_range=(2, 8))
    gbatch = {k: (jnp.asarray(v) if not isinstance(v, list)
                  else [jnp.asarray(x) for x in v])
              for k, v in gbatch.items()}
    state = create_train_state(model, jax.random.key(0), gbatch,
                               make_optimizer("adamw", 1e-3))
    state = jax.device_put(state, pmesh.replicated(mesh))
    sharded = pmesh.shard_batch(mesh, gbatch)
    state, metrics = jax.jit(make_train_step(model))(state, sharded)
    checksum = float(jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(l))
                      for l in jax.tree_util.tree_leaves(p)))(state.params))
    assert results[0]["checksum"] == pytest.approx(checksum, rel=1e-5)
    assert results[0]["loss"] == pytest.approx(float(metrics["loss"]),
                                               rel=1e-4)
