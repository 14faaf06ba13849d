"""End-to-end drives of the driver CLIs (SURVEY P17-P21, P24) on tiny
synthetic data trees.

Counterpart of the reference's manual script usage (``test_kitti.py``,
``test_mid.py``, ``test_eth3d.py``, ``save_disp.py``, ``save_vid.py``):
each CLI runs as a real subprocess with ``--cpu`` against a generated
dataset tree and a random-init S-variant model, asserting exit code 0,
finite reported metrics, and the expected output artifacts.

Images are 62x94 so the /32 padding (to 64x96) and cropping paths are
both exercised at the smallest legal size for the cv16 model.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")

S_ARGS = ["--cpu", "--backbone", "mobilenetv2_100", "--cv_scale", "16",
          "--maxdisp", "64"]


def _run(script: str, *args: str) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp_cpu_tests"))
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, script), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, (
        f"{script} failed:\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def _rand_png(path: str, rng: np.random.Generator,
              shape=(62, 94, 3)) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, shape, dtype=np.uint8)).save(path)


def _disp_png16(path: str, rng: np.random.Generator, shape=(62, 94)) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    disp = rng.uniform(1.0, 40.0, shape).astype(np.float32)
    Image.fromarray((disp * 256).astype(np.uint16)).save(path)


@pytest.fixture(scope="module")
def kitti15_tree(tmp_path_factory):
    """KITTI-2015 layout: ``root/training/{image_2,image_3,disp_occ_0}``.

    The eval CLIs take the ``training/`` dir as --datapath (reference
    convention, ``test_kitti.py:48-50``); make_filelists takes ``root``.
    """
    root = tmp_path_factory.mktemp("kitti15")
    rng = np.random.default_rng(1)
    train = root / "training"
    for name in ("000000_10.png", "000001_10.png"):
        _rand_png(str(train / "image_2" / name), rng)
        _rand_png(str(train / "image_3" / name), rng)
        _disp_png16(str(train / "disp_occ_0" / name), rng)
    return str(root)


def test_test_kitti_cli(kitti15_tree, tmp_path):
    out = _run("test_kitti.py", *S_ARGS, "--datapath",
               os.path.join(kitti15_tree, "training"),
               "--limit", "2", "--save_dir", str(tmp_path / "viz"))
    m = re.search(r"#### EPE ([-\d.eE]+)", out)
    assert m and np.isfinite(float(m.group(1))), out[-2000:]
    for sub in ("error", "gt", "disp"):
        assert os.listdir(tmp_path / "viz" / sub)


def test_save_disp_cli(kitti15_tree, tmp_path):
    outdir = tmp_path / "preds"
    _run("save_disp.py", *S_ARGS, "--datapath",
         os.path.join(kitti15_tree, "training"),
         "--limit", "1", "--outdir", str(outdir))
    files = os.listdir(outdir)
    assert files == ["000000_10.png"]
    arr = np.array(Image.open(outdir / files[0]))
    # KITTI submission format: uint16, disparity x 256, original size
    assert arr.dtype == np.uint16 and arr.shape == (62, 94)


def test_save_vid_cli(tmp_path):
    rng = np.random.default_rng(2)
    seq = tmp_path / "raw"
    for i in range(2):
        _rand_png(str(seq / "image_02" / "data" / f"{i:010d}.png"), rng)
        _rand_png(str(seq / "image_03" / "data" / f"{i:010d}.png"), rng)
    outdir = tmp_path / "frames"
    _run("save_vid.py", *S_ARGS, "--datapath", str(seq),
         "--limit", "2", "--outdir", str(outdir))
    frames = sorted(os.listdir(outdir))
    assert frames == ["000000.png", "000001.png"]
    stacked = np.array(Image.open(outdir / frames[0]))
    assert stacked.shape == (62 * 2, 94, 3)  # image over colormapped disp


@pytest.fixture(scope="module")
def scene_tree(tmp_path_factory):
    """ETH3D/Middlebury-convention tree: scene dirs with im0/im1/PFM GT."""
    sys.path.insert(0, REPO)
    from esmstereo_tpu.data.io import pfm_imwrite

    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.default_rng(3)
    for scene in ("sceneA", "sceneB"):
        d = root / scene
        _rand_png(str(d / "im0.png"), rng, shape=(64, 96, 3))
        _rand_png(str(d / "im1.png"), rng, shape=(64, 96, 3))
        disp = rng.uniform(1.0, 30.0, (64, 96)).astype(np.float32)
        disp[0, 0] = np.inf  # PFM invalid marker must be tolerated
        pfm_imwrite(str(d / "disp0GT.pfm"), disp)
        mask = np.full((64, 96), 255, np.uint8)
        mask[:8] = 128  # occluded band
        Image.fromarray(mask).save(d / "mask0nocc.png")
    return str(root)


def test_test_mid_cli(scene_tree):
    out = _run("test_mid.py", *S_ARGS, "--datapath", scene_tree,
               "--limit", "2")
    nums = [float(x) for x in
            re.findall(r"(?:bad|epe)\D*?([\d.]+)", out, re.IGNORECASE)]
    assert nums and all(np.isfinite(n) for n in nums), out[-2000:]


def test_test_eth3d_cli(scene_tree):
    out = _run("test_eth3d.py", *S_ARGS, "--datapath", scene_tree,
               "--limit", "2")
    nums = [float(x) for x in
            re.findall(r"(?:bad|epe)\D*?([\d.]+)", out, re.IGNORECASE)]
    assert nums and all(np.isfinite(n) for n in nums), out[-2000:]


def test_train_sceneflow_cli(tmp_path):
    """One-epoch SceneFlow recipe through the real CLI (SURVEY P15)."""
    rng = np.random.default_rng(4)
    data = tmp_path / "sf"
    lines = []
    for i in range(4):
        _rand_png(str(data / f"l{i}.png"), rng, shape=(64, 96, 3))
        _rand_png(str(data / f"r{i}.png"), rng, shape=(64, 96, 3))
        sys.path.insert(0, REPO)
        from esmstereo_tpu.data.io import pfm_imwrite
        pfm_imwrite(str(data / f"d{i}.pfm"),
                    rng.uniform(1, 40, (64, 96)).astype(np.float32))
        lines.append(f"l{i}.png r{i}.png d{i}.pfm")
    (data / "list.txt").write_text("\n".join(lines) + "\n")

    logdir = tmp_path / "logs"
    # crops must be /32-divisible like every reference recipe shape
    out = _run("train_sceneflow.py", *S_ARGS,
               "--datapath", str(data), "--trainlist", str(data / "list.txt"),
               "--testlist", str(data / "list.txt"), "--epochs", "1",
               "--batch_size", "2", "--test_batch_size", "2",
               "--num_workers", "1", "--crop", "64,96",
               "--eval_crop", "64,96", "--logdir", str(logdir))
    assert "best:" in out, out[-2000:]
    assert any(f.startswith("checkpoint_") for f in os.listdir(logdir)), \
        os.listdir(logdir)


def test_train_kitti_cli(tmp_path):
    """One-epoch KITTI finetune through the real CLI (SURVEY P16)."""
    rng = np.random.default_rng(5)
    root = tmp_path / "kitti"
    for name in ("000000_10.png", "000001_10.png"):
        _rand_png(str(root / "training" / "image_2" / name), rng,
                  shape=(94, 158, 3))
        _rand_png(str(root / "training" / "image_3" / name), rng,
                  shape=(94, 158, 3))
        _disp_png16(str(root / "training" / "disp_occ_0" / name), rng,
                    shape=(94, 158))
    listfile = tmp_path / "kitti15_all.txt"
    _run("make_filelists.py", "kitti15", str(root), "-o", str(listfile))
    logdir = tmp_path / "logs"
    out = _run("train_kitti.py", *S_ARGS,
               "--datapath_12", str(root), "--datapath_15", str(root),
               "--trainlist", str(listfile), "--testlist", str(listfile),
               "--epochs", "1", "--batch_size", "2", "--test_batch_size", "2",
               "--num_workers", "1", "--crop", "64,96", "--pad_to", "96,160",
               "--logdir", str(logdir), "--save_freq", "1")
    assert "best:" in out, out[-2000:]


def test_make_filelists_cli(kitti15_tree, tmp_path):
    listfile = tmp_path / "kitti15_all.txt"
    _run("make_filelists.py", "kitti15", kitti15_tree, "-o", str(listfile))
    lines = listfile.read_text().strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        parts = line.split()
        assert len(parts) == 3
        assert parts[0].startswith("training/image_2/")
        assert parts[2].startswith("training/disp_occ_0/")


def test_live_realsense_synthetic_cli(tmp_path):
    """P22 execution evidence: the RealSense tool's full frame loop
    (depth conversion, colormap, FPS/centre annotation, frame output)
    runs end-to-end from the synthetic camera — no SDK needed."""
    outdir = tmp_path / "depth_frames"
    out = _run("live_realsense.py", *S_ARGS, "--cpu", "--synthetic", "2",
               "--outdir", str(outdir), "--stream_height", "64",
               "--stream_width", "96")
    assert "synthetic done: centre" in out
    frames = sorted(os.listdir(outdir))
    assert frames == ["000000.png", "000001.png"]
    vis = np.array(Image.open(outdir / frames[0]))
    assert vis.shape == (64, 96, 3)
