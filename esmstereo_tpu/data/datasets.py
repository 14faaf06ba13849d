"""SceneFlow and KITTI stereo datasets (list-file driven, host-side numpy).

Reference semantics: ``/root/reference/datasets/sceneflow_dataset.py`` and
``kitti_dataset.py``. Samples come out NHWC float32 (ImageNet-normalised)
with GT disparity and (train) its /2../16 nearest pyramid.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image

from esmstereo_tpu.data import transforms as T
from esmstereo_tpu.data.io import normalize_image, pfm_imread, read_all_lines


def _load_rgb(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("RGB"), dtype=np.uint8)


def train_augment(rng: np.random.Generator, left: np.ndarray,
                  right: np.ndarray, disp: np.ndarray,
                  crop: tuple[int, int] = (256, 512),
                  occlusion_prob: float = 0.5) -> dict:
    """The shared training pipeline: chromatic aug → crop → occlusion →
    pyramid → normalise (``sceneflow_dataset.py:55-132``)."""
    left, right = T.asymmetric_chromatic_aug(rng, left, right)
    left, right, disp = T.random_crop(rng, left, right, disp, crop)
    right = T.random_occlusion_patch(rng, right, occlusion_prob)
    disp = np.ascontiguousarray(disp, dtype=np.float32)
    return {
        "left": normalize_image(left),
        "right": normalize_image(right),
        "disparity": disp,
        "disparity_low": T.disparity_pyramid(disp),
    }


class SceneFlowDataset:
    """SceneFlow (FlyingThings3D et al.) via a ``left right disp`` list file.

    Eval takes the bottom-right 960x512 crop (``sceneflow_dataset.py:134-139``).
    """

    def __init__(self, datapath: str, list_filename: str, training: bool,
                 crop: tuple[int, int] = (256, 512),
                 eval_crop: tuple[int, int] = (512, 960)) -> None:
        self.datapath = datapath
        self.training = training
        self.crop = crop
        self.eval_crop = eval_crop
        lines = [l.split() for l in read_all_lines(list_filename)]
        self.left_filenames = [x[0] for x in lines]
        self.right_filenames = [x[1] for x in lines]
        self.disp_filenames = [x[2] for x in lines]

    def __len__(self) -> int:
        return len(self.left_filenames)

    def get(self, index: int, rng: np.random.Generator) -> dict:
        left = _load_rgb(os.path.join(self.datapath, self.left_filenames[index]))
        right = _load_rgb(os.path.join(self.datapath, self.right_filenames[index]))
        disp, _ = pfm_imread(os.path.join(self.datapath,
                                          self.disp_filenames[index]))
        disp = np.ascontiguousarray(disp, dtype=np.float32)

        if self.training:
            return train_augment(rng, left, right, disp, self.crop,
                                 occlusion_prob=0.5)

        h, w = left.shape[:2]
        ch, cw = self.eval_crop
        left = left[h - ch:, w - cw:]
        right = right[h - ch:, w - cw:]
        disp = disp[h - ch:, w - cw:]
        return {
            "left": normalize_image(left),
            "right": normalize_image(right),
            "disparity": disp,
            "top_pad": 0,
            "right_pad": 0,
        }


class KITTIDataset:
    """KITTI 2012+2015 mixed dataset.

    Routing: a leading ``image_*`` directory component selects the 2015
    root, otherwise 2012 (``kitti_dataset.py:52-56``). GT disparity is
    uint16 PNG / 256. Eval zero-pads to 384x1248 (top+right) and returns
    the pad sizes for later un-padding.
    """

    def __init__(self, datapath_12: str, datapath_15: str, list_filename: str,
                 training: bool, crop: tuple[int, int] = (256, 512),
                 pad_to: tuple[int, int] = (384, 1248)) -> None:
        self.datapath_12 = datapath_12
        self.datapath_15 = datapath_15
        self.training = training
        self.crop = crop
        self.pad_to = pad_to
        lines = [l.split() for l in read_all_lines(list_filename)]
        self.left_filenames = [x[0] for x in lines]
        self.right_filenames = [x[1] for x in lines]
        self.disp_filenames = ([x[2] for x in lines]
                               if len(lines[0]) >= 3 else None)
        if training:
            assert self.disp_filenames is not None

    def __len__(self) -> int:
        return len(self.left_filenames)

    def _root(self, index: int) -> str:
        name = self.left_filenames[index].split("/")[1]
        return self.datapath_15 if name.startswith("image") else self.datapath_12

    def get(self, index: int, rng: np.random.Generator) -> dict:
        root = self._root(index)
        left = _load_rgb(os.path.join(root, self.left_filenames[index]))
        right = _load_rgb(os.path.join(root, self.right_filenames[index]))
        disp = None
        if self.disp_filenames is not None:
            disp = np.array(
                Image.open(os.path.join(root, self.disp_filenames[index])),
                dtype=np.float32) / 256.0

        if self.training:
            return train_augment(rng, left, right, disp, self.crop,
                                 occlusion_prob=0.2)

        h, w = left.shape[:2]
        ph, pw = self.pad_to
        top_pad, right_pad = ph - h, pw - w
        assert top_pad >= 0 and right_pad >= 0, (h, w)

        def pad_img(x):
            return np.pad(x, ((top_pad, 0), (0, right_pad), (0, 0)))

        out = {
            "left": pad_img(normalize_image(left)),
            "right": pad_img(normalize_image(right)),
            "top_pad": top_pad,
            "right_pad": right_pad,
            "left_filename": self.left_filenames[index],
        }
        if disp is not None:
            out["disparity"] = np.pad(disp, ((top_pad, 0), (0, right_pad)))
        return out


__datasets__ = {
    "sceneflow": SceneFlowDataset,
    "kitti": KITTIDataset,
}
