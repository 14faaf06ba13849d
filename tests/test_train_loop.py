"""Full training-loop integration: recipe loop, checkpoint save/resume,
warm-start — on a tiny synthetic SceneFlow-style dataset."""

import numpy as np
import pytest
from PIL import Image

from esmstereo_tpu.data.datasets import SceneFlowDataset
from esmstereo_tpu.data.io import pfm_imwrite
from esmstereo_tpu.data.loader import DataLoader
from esmstereo_tpu.models import ESMStereo, ESMStereoConfig
from esmstereo_tpu.train import checkpoints as ckpt
from esmstereo_tpu.train.loop import TrainLoopConfig, run_training


@pytest.fixture(scope="module")
def tiny_sceneflow(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf")
    rng = np.random.default_rng(0)
    h, w, n = 64, 96, 4
    lines = []
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            tmp / f"l{i}.png")
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            tmp / f"r{i}.png")
        pfm_imwrite(str(tmp / f"d{i}.pfm"),
                    rng.uniform(1, 40, (h, w)).astype(np.float32))
        lines.append(f"l{i}.png r{i}.png d{i}.pfm")
    (tmp / "list.txt").write_text("\n".join(lines) + "\n")
    return tmp


def _model():
    return ESMStereo(config=ESMStereoConfig(
        cv_scale=4, backbone="mobilenetv2_100", use_pallas=False))


def test_training_loop_with_resume_and_warmstart(tiny_sceneflow, tmp_path):
    tmp = tiny_sceneflow
    train_ds = SceneFlowDataset(str(tmp), str(tmp / "list.txt"),
                                training=True, crop=(48, 64))
    test_ds = SceneFlowDataset(str(tmp), str(tmp / "list.txt"),
                               training=False, eval_crop=(64, 96))
    train_loader = DataLoader(train_ds, 2, num_workers=2)
    test_loader = DataLoader(test_ds, 2, num_workers=2, drop_last=False)

    logdir = str(tmp_path / "logs")
    cfg = TrainLoopConfig(epochs=1, lr=1e-3, lrepochs="10:2",
                          logdir=logdir, save_freq=1, image_freq=2)

    class FakeWriter:
        scalars: list = []
        images: list = []

        def add_scalar(self, name, value, step):
            self.scalars.append((name, value, step))

        def add_image(self, name, img, step):
            self.images.append((name, np.asarray(img).shape, step))

    logs = []
    writer = FakeWriter()
    res = run_training(_model(), cfg, train_loader, test_loader,
                       logger=writer, log_fn=logs.append)
    assert res["best_epoch"] == 0
    assert np.isfinite(res["best_metric"])
    # image dumps at image_freq (reference save_images surface,
    # experiment.py:80-100): left / GT / estimate / error map, CHW
    img_names = {n for n, _, _ in writer.images}
    assert {"train/imgL", "train/disp_gt", "train/disp_est",
            "train/errormap"} <= img_names, img_names
    assert all(len(s) == 3 and s[0] in (1, 3) for _, s, _ in writer.images)
    assert any(n.startswith("train/") for n, _, _ in writer.scalars)
    latest = ckpt.latest_checkpoint(logdir)
    assert latest and latest.endswith("checkpoint_000000")

    # resume continues at epoch 1
    cfg2 = TrainLoopConfig(epochs=2, lr=1e-3, lrepochs="10:2",
                           logdir=logdir, save_freq=1, resume=True)
    logs2 = []
    run_training(_model(), cfg2, train_loader, test_loader,
                 log_fn=logs2.append)
    assert any("resuming" in l for l in logs2)
    assert any("Epoch 1/2" in l for l in logs2)
    assert not any("Epoch 0/2" in l for l in logs2)

    # warm-start from the checkpoint into a fresh run
    cfg3 = TrainLoopConfig(epochs=1, lr=1e-3, lrepochs="10:2",
                           logdir=str(tmp_path / "logs2"),
                           loadckpt=ckpt.latest_checkpoint(logdir))
    logs3 = []
    run_training(_model(), cfg3, train_loader, None, log_fn=logs3.append)
    assert any("warm-starting" in l for l in logs3)
