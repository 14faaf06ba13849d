"""KITTI 2012+2015 finetuning CLI.

TPU-native counterpart of ``/root/reference/train_kitti.py``: Adam lr 1e-3,
600 epochs capped at 100 batches each, LR/10 at epoch 300, warm-start from
the SceneFlow checkpoint, model selection on D1.
"""

from __future__ import annotations

import argparse

from common import add_model_args, add_runtime_args, apply_runtime_flags, build_config


def parse_args():
    p = argparse.ArgumentParser(description="ESMStereo-TPU KITTI finetune")
    add_model_args(p)
    p.add_argument("--datapath_12", default="/datasets/kitti_2012/")
    p.add_argument("--datapath_15", default="/datasets/kitti_2015/")
    p.add_argument("--trainlist", default="./filenames/kitti12_15_all.txt")
    p.add_argument("--testlist", default="./filenames/kitti15_val.txt")
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--test_batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--lrepochs", type=str, default="300:10")
    p.add_argument("--logdir", default="./logs/kitti")
    p.add_argument("--loadckpt", default="",
                   help="SceneFlow checkpoint to warm-start from")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=1)
    p.add_argument("--image_freq", type=int, default=0,
                   help="TB image dumps every N steps (0=off)")
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--worker_processes", type=int, default=1,
                   help="1: fork-based loader workers (the reference's\n                   torch-loader semantics; thread workers serialize on the GIL)")
    p.add_argument("--max_batches", type=int, default=100,
                   help="batches per epoch cap (train_kitti.py:116-117)")
    p.add_argument("--spatial_shards", type=int, default=1)
    p.add_argument("--fix_cv16_loss", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--crop", default="256,512",
                   help="training crop H,W")
    p.add_argument("--pad_to", default="384,1248",
                   help="eval zero-pad target H,W (reference 384,1248)")
    add_runtime_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    apply_runtime_flags(args)
    import jax

    from esmstereo_tpu.data.datasets import KITTIDataset
    from esmstereo_tpu.data.loader import DataLoader
    from esmstereo_tpu.models import ESMStereo
    from esmstereo_tpu.parallel import mesh as pmesh
    from esmstereo_tpu.train.loop import TrainLoopConfig, run_training

    cfg = build_config(args)
    model = ESMStereo(config=cfg)

    mesh = pmesh.auto_mesh(args.batch_size, spatial=args.spatial_shards)
    if mesh is not None:
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
        # H-sharding cannot partition pallas_call; swap to the XLA paths.
        cfg = pmesh.spatial_safe_config(cfg, mesh)
        model = ESMStereo(config=cfg)

    def _hw(spec):
        h, w = (int(v) for v in spec.split(","))
        return h, w

    train_ds = KITTIDataset(args.datapath_12, args.datapath_15,
                            args.trainlist, training=True,
                            crop=_hw(args.crop))
    test_ds = KITTIDataset(args.datapath_12, args.datapath_15,
                           args.testlist, training=False,
                           pad_to=_hw(args.pad_to))
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
        optimizer="adam", logdir=args.logdir, resume=args.resume,
        loadckpt=args.loadckpt, save_freq=args.save_freq,
        summary_freq=args.summary_freq,
        image_freq=args.image_freq,
        max_batches_per_epoch=args.max_batches, select_metric="D1",
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
