"""Data-layer tests: transforms vs torchvision golden, datasets, loader."""

import os

import numpy as np
import pytest
from PIL import Image

from esmstereo_tpu.data import transforms as T
from esmstereo_tpu.data.datasets import KITTIDataset, SceneFlowDataset
from esmstereo_tpu.data.io import (
    normalize_image,
    pfm_imread,
    pfm_imwrite,
    read_all_lines,
)
from esmstereo_tpu.data.loader import DataLoader

try:
    import torchvision.transforms.functional as TVF
    HAS_TORCHVISION = True
except Exception:
    HAS_TORCHVISION = False


@pytest.mark.skipif(not HAS_TORCHVISION, reason="torchvision unavailable")
def test_photometric_matches_torchvision(rng):
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    pil = Image.fromarray(img)
    for factor in (0.5, 1.0, 1.7):
        np.testing.assert_allclose(
            T.adjust_brightness(img, factor),
            np.array(TVF.adjust_brightness(pil, factor)), atol=1)
        np.testing.assert_allclose(
            T.adjust_gamma(img, factor),
            np.array(TVF.adjust_gamma(pil, factor)), atol=1)
        np.testing.assert_allclose(
            T.adjust_contrast(img, factor),
            np.array(TVF.adjust_contrast(pil, factor)), atol=1)
        np.testing.assert_allclose(
            T.adjust_saturation(img, factor),
            np.array(TVF.adjust_saturation(pil, factor)), atol=1)


def test_pyramid_is_strided_slice(rng):
    d = rng.random((64, 128)).astype(np.float32)
    pyr = T.disparity_pyramid(d)
    assert [p.shape for p in pyr] == [(32, 64), (16, 32), (8, 16), (4, 8)]
    np.testing.assert_array_equal(pyr[0], d[::2, ::2])


def test_occlusion_patch_fills_mean(rng):
    img = rng.integers(0, 256, (256, 512, 3), dtype=np.uint8)
    out = T.random_occlusion_patch(rng, img, prob=1.0)
    changed = (out != img).any(axis=-1)
    assert changed.any()
    mean = np.mean(np.mean(img, 0), 0).astype(out.dtype)
    ys, xs = np.where(changed)
    np.testing.assert_array_equal(out[ys[0], xs[0]], mean)


def test_pfm_roundtrip(tmp_path, rng):
    data = rng.standard_normal((17, 23)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    pfm_imwrite(path, data)
    back, scale = pfm_imread(path)
    np.testing.assert_array_equal(back, data)


def _write_synth_sceneflow(tmp_path, n=4, h=64, w=96):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        lp, rp, dp = f"l{i}.png", f"r{i}.png", f"d{i}.pfm"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            tmp_path / lp)
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            tmp_path / rp)
        pfm_imwrite(str(tmp_path / dp),
                    rng.uniform(1, 50, (h, w)).astype(np.float32))
        lines.append(f"{lp} {rp} {dp}")
    listfile = tmp_path / "list.txt"
    listfile.write_text("\n".join(lines) + "\n")
    return str(listfile)


def test_sceneflow_dataset_and_loader(tmp_path):
    listfile = _write_synth_sceneflow(tmp_path)
    ds = SceneFlowDataset(str(tmp_path), listfile, training=True,
                          crop=(32, 64))
    assert len(ds) == 4
    sample = ds.get(0, np.random.default_rng(0))
    assert sample["left"].shape == (32, 64, 3)
    assert sample["disparity"].shape == (32, 64)
    assert len(sample["disparity_low"]) == 4
    assert sample["left"].dtype == np.float32

    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["left"].shape == (2, 32, 64, 3)
    assert batches[0]["disparity_low"][1].shape == (2, 8, 16)

    # determinism: same seed+epoch -> identical batches
    again = list(DataLoader(ds, batch_size=2, num_workers=1, seed=3))
    np.testing.assert_array_equal(batches[0]["left"], again[0]["left"])

    # host sharding covers disjoint indices
    s0 = DataLoader(ds, batch_size=1, num_workers=1, shard_index=0,
                    num_shards=2)
    s1 = DataLoader(ds, batch_size=1, num_workers=1, shard_index=1,
                    num_shards=2)
    assert len(s0) == 2 and len(s1) == 2

    # fork-worker mode yields identical batches in identical order
    procs = list(DataLoader(ds, batch_size=2, num_workers=2, seed=3,
                            use_processes=True))
    assert len(procs) == 2
    for a, b in zip(batches, procs):
        np.testing.assert_array_equal(a["left"], b["left"])
        np.testing.assert_array_equal(a["disparity"], b["disparity"])


def test_sceneflow_eval_crop(tmp_path):
    listfile = _write_synth_sceneflow(tmp_path, h=80, w=120)
    ds = SceneFlowDataset(str(tmp_path), listfile, training=False,
                          eval_crop=(64, 96))
    s = ds.get(0, np.random.default_rng(0))
    assert s["left"].shape == (64, 96, 3)
    assert s["top_pad"] == 0 and s["right_pad"] == 0


def test_kitti_routing_and_eval_padding(tmp_path):
    rng = np.random.default_rng(0)
    h, w = 60, 100
    # KITTI-2015-style tree under root15, 2012-style under root12
    for root, img_l in (("k15", "image_2"), ("k12", "colored_0")):
        img_r = {"image_2": "image_3", "colored_0": "colored_1"}[img_l]
        disp = {"image_2": "disp_occ_0", "colored_0": "disp_occ"}[img_l]
        for sub in (img_l, img_r, disp):
            os.makedirs(tmp_path / root / "training" / sub, exist_ok=True)
        base = tmp_path / root / "training"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            base / img_l / "000000_10.png")
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            base / img_r / "000000_10.png")
        Image.fromarray(
            (rng.uniform(1, 50, (h, w)) * 256).astype(np.uint16)).save(
            base / disp / "000000_10.png")
    listfile = tmp_path / "list.txt"
    listfile.write_text(
        "training/image_2/000000_10.png training/image_3/000000_10.png "
        "training/disp_occ_0/000000_10.png\n"
        "training/colored_0/000000_10.png training/colored_1/000000_10.png "
        "training/disp_occ/000000_10.png\n")
    ds = KITTIDataset(str(tmp_path / "k12"), str(tmp_path / "k15"),
                      str(listfile), training=False, pad_to=(64, 128))
    for i in range(2):  # index 0 routes to 2015, index 1 to 2012
        s = ds.get(i, np.random.default_rng(0))
        assert s["left"].shape == (64, 128, 3)
        assert s["top_pad"] == 4 and s["right_pad"] == 28
        assert (s["disparity"][:4] == 0).all()  # padded GT is invalid


def test_loader_worker_errors_surface(tmp_path):
    """A raising dataset.get must surface as an exception in the
    consumer — in BOTH worker modes — rather than hanging the loop."""
    class Bad:
        def __len__(self):
            return 4

        def get(self, i, rng):
            if i == 2:
                raise ValueError("bad sample 2")
            return {"x": np.zeros((2, 2), np.float32)}

    for kw in ({}, {"use_processes": True}):
        loader = DataLoader(Bad(), batch_size=2, num_workers=2, **kw)
        with pytest.raises(Exception, match="bad sample 2"):
            list(loader)


def test_scene_batch_geometry(rng):
    """make_scene_batch is geometrically exact: wherever a left pixel's
    layer is also visible at its matched right location, the (normalised)
    pixel values agree bitwise; and both occluded and multi-layer
    structure actually occur."""
    from esmstereo_tpu.data.synthetic import make_scene_batch

    b = make_scene_batch(rng, batch=4, h=64, w=128, disp_range=(4, 24),
                         return_layers=True)
    h, w = 64, 128
    any_occluded = False
    for i in range(4):
        left, right = b["left"][i], b["right"][i]
        gt = b["disparity"][i]
        assert len(np.unique(gt)) >= 2  # background + >=1 foreground layer
        # right-view ownership: composite the ORIGINAL layer masks the
        # same back-to-front way the generator composites textures (the
        # final left masks differ in dis-occluded regions)
        own_r = np.zeros((h, w), np.float32)
        for mask, d in b["layers"][i]:
            mask_r = np.zeros((h, w), bool)
            mask_r[:, : w - int(d)] = mask[:, int(d):]
            own_r[mask_r] = d
        xs = np.arange(w)[None, :].repeat(h, 0)
        xr = xs - gt.astype(int)
        valid = xr >= 0
        vis = valid & (own_r[np.arange(h)[:, None], np.clip(xr, 0, w - 1)]
                       == gt)
        assert vis.mean() > 0.5
        any_occluded |= bool((valid & ~vis).any())
        li = left[vis]
        ri = right[np.arange(h)[:, None].repeat(w, 1)[vis], xr[vis]]
        np.testing.assert_array_equal(li, ri)
    assert any_occluded


def test_accuracy_scoreboard_smoke(tmp_path):
    """The scoreboard tool runs end-to-end (tiny config) and writes a
    well-formed ACCURACY.json."""
    import json

    from tools.accuracy_scoreboard import main

    out = tmp_path / "ACCURACY.json"
    res = main(["--cpu", "--variants", "S", "--steps", "2",
                "--height", "64", "--width", "96", "--batch", "2",
                "--eval_pairs", "2", "--disp_max", "16",
                "--out", str(out)])
    on_disk = json.loads(out.read_text())
    assert on_disk == res
    s = on_disk["variants"]["S"]
    assert {"EPE", "D1", "Thres1", "Thres2", "Thres3"} <= set(s)
    assert on_disk["meta"]["eval_seed"] == 9999


def test_accuracy_scoreboard_confidence_two_phase(tmp_path):
    """The C variant's two-phase recipe runs end to end: phase A trains
    the disparity trunk, phase B trains the LAFNet head alone (BCE,
    frozen trunk). Runs with forced-interpret Pallas kernels so a
    regression that routes phase B's differentiated forward through a
    pallas_call (which has no JVP rule — the round-5 TPU crash) fails
    here too."""
    import json

    from esmstereo_tpu.ops import pallas as pk
    from tools.accuracy_scoreboard import main

    out = tmp_path / "ACC_C.json"
    pk.set_force_interpret(True)
    try:
        res = main(["--cpu", "--variants", "C", "--steps", "1",
                    "--conf_steps", "1", "--height", "64", "--width", "96",
                    "--batch", "2", "--eval_pairs", "2", "--disp_max", "16",
                    "--out", str(out)])
    finally:
        pk.set_force_interpret(False)
    c = json.loads(out.read_text())["variants"]["C"]
    assert res["variants"]["C"] == c
    # phase-B metrics recorded alongside the disparity ones
    assert {"bce", "conf_acc"} <= set(c["final_train"])
