"""SceneFlow pretraining CLI.

TPU-native counterpart of ``/root/reference/train_sceneflow.py``: same
flags, recipe (AdamW lr 1e-3, batch 4, 60 epochs, LR/2 at {20,32,40,48,56},
256x512 crops) and logging; the step itself is one fused XLA program and
scales over a (data, spatial) device mesh.
"""

from __future__ import annotations

import argparse

from common import add_model_args, add_runtime_args, apply_runtime_flags, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU SceneFlow training")
    add_model_args(p)
    p.add_argument("--dataset", default="sceneflow", choices=["sceneflow"])
    p.add_argument("--datapath", default="/datasets/SceneFlow/flyingthings3d")
    p.add_argument("--trainlist", default="./filenames/sceneflow_train.txt")
    p.add_argument("--testlist", default="./filenames/sceneflow_test.txt")
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--test_batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--lrepochs", type=str, default="20,32,40,48,56:2")
    p.add_argument("--logdir", default="./logs/sceneflow")
    p.add_argument("--loadckpt", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--performance", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=1)
    p.add_argument("--image_freq", type=int, default=0,
                   help="TB image dumps every N steps (0=off)")
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--worker_processes", type=int, default=1,
                   help="1: fork-based loader workers (the reference's\n                   torch-loader semantics; thread workers serialize on the GIL)")
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="mesh 'spatial' axis size (H-sharding)")
    p.add_argument("--fix_cv16_loss", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--crop", default="256,512",
                   help="training crop H,W (reference default 256,512; "
                        "smaller values for smoke tests)")
    p.add_argument("--eval_crop", default="512,960",
                   help="eval bottom-right crop H,W")
    add_runtime_args(p)
    return p.parse_args()


def _hw(spec: str) -> tuple[int, int]:
    h, w = (int(v) for v in spec.split(","))
    return h, w


def main():
    args = parse_args()
    apply_runtime_flags(args)
    import jax
    import numpy as np

    from esmstereo_tpu.data.datasets import SceneFlowDataset
    from esmstereo_tpu.data.loader import DataLoader
    from esmstereo_tpu.models import ESMStereo
    from esmstereo_tpu.parallel import mesh as pmesh
    from esmstereo_tpu.train.loop import (
        TrainLoopConfig,
        measure_performance,
        run_training,
    )
    from esmstereo_tpu.train.state import count_params

    cfg = build_config(args)
    model = ESMStereo(config=cfg)

    if args.performance:
        rng = np.random.default_rng(0)
        left = np.asarray(rng.standard_normal((1, 512, 960, 3)),
                          dtype=np.float32)
        variables = jax.jit(
            lambda l, r: model.init(jax.random.key(0), l, r, train=False)
        )(left, left)
        print("The number of parameters:", count_params(variables["params"]))
        ms = measure_performance(model, variables)
        print("inference time = ", ms)
        return

    mesh = pmesh.auto_mesh(args.batch_size, spatial=args.spatial_shards)
    if mesh is not None:
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
        # H-sharding cannot partition pallas_call; swap to the XLA paths.
        cfg = pmesh.spatial_safe_config(cfg, mesh)
        model = ESMStereo(config=cfg)

    train_ds = SceneFlowDataset(args.datapath, args.trainlist, training=True,
                                crop=_hw(args.crop))
    test_ds = SceneFlowDataset(args.datapath, args.testlist, training=False,
                               eval_crop=_hw(args.eval_crop))
    shard_index, num_shards = jax.process_index(), jax.process_count()
    train_loader = DataLoader(train_ds, args.batch_size,
                              num_workers=args.num_workers, drop_last=True,
                              use_processes=bool(args.worker_processes),
                              seed=args.seed, shard_index=shard_index,
                              num_shards=num_shards)
    test_loader = DataLoader(test_ds, args.test_batch_size,
                             num_workers=args.num_workers, drop_last=False,
                             seed=args.seed, shard_index=shard_index,
                             num_shards=num_shards)

    loop_cfg = TrainLoopConfig(
        epochs=args.epochs, lr=args.lr, lrepochs=args.lrepochs,
        optimizer="adamw", logdir=args.logdir, resume=args.resume,
        loadckpt=args.loadckpt, save_freq=args.save_freq,
        summary_freq=args.summary_freq, select_metric="EPE",
        image_freq=args.image_freq,
        fix_cv16_loss=args.fix_cv16_loss, seed=args.seed)

    logger = None
    try:
        from tensorboardX import SummaryWriter
        logger = SummaryWriter(args.logdir)
    except Exception:
        pass

    result = run_training(model, loop_cfg, train_loader, test_loader,
                          mesh=mesh, logger=logger)
    print("best:", result)


if __name__ == "__main__":
    main()
