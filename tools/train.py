#!/usr/bin/env python
"""Training CLI (reference ``tools/train.py`` equivalent).

Usage:
    python tools/train.py CONFIG [--work-dir DIR] [--resume-from CKPT]
        [--seed N] [--max-iters N] [--cfg-options k=v ...]

The config's ``task`` selects the loop: 'ssl' (DetMatch), 'pretrain_3d'
(PV-RCNN supervised), or 'pretrain_2d' (Faster R-CNN supervised).
"""
import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_options(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    from detmatch_tpu.utils.env import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--load-from-with-optimizer", default=None,
                    help="SSL ckpt dir: restore model+optimizer, reset "
                         "the iteration counter (bootstrapped resume)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--cfg-options", nargs="*", default=None)
    ap.add_argument("--dist-coordinator", default=None,
                    help="host:port of process 0 (multi-host; or set "
                         "DETMATCH_COORDINATOR / run tools/dist_train.py)")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--autoscale-lr", action="store_true",
                    help="linear-scale learning rates by device_count/8 "
                         "(reference tools/train.py:124-132)")
    args = ap.parse_args()

    from detmatch_tpu.parallel import init_distributed
    init_distributed(args.dist_coordinator, args.dist_num_processes,
                     args.dist_process_id)

    from detmatch_tpu.config import Config
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_options(args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir") or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    if args.max_iters:
        cfg["max_iters"] = args.max_iters
    if args.autoscale_lr:
        # linear scaling rule (arXiv:1706.02677), reference
        # tools/train.py:124-132: every optimizer LR scales by the
        # fraction of the 8-device reference fleet actually in use
        import jax
        scale = jax.device_count() / 8.0
        for k in ("base_lr",):
            if k in cfg:
                cfg[k] = cfg[k] * scale
        cfg["autoscale_lr_factor"] = scale

    from detmatch_tpu.apis import build
    rng = np.random.RandomState(args.seed)
    task = cfg.get("task", "ssl")

    if task == "ssl":
        from detmatch_tpu.apis.train_ssl import train_ssl
        from detmatch_tpu.data.collate import collate_ts
        ssl = build.build_ssl(cfg)
        vox = build.build_voxelizer(cfg["voxelizer"])
        lab = build.build_dataset(cfg["data"]["train_lab"], rng=rng)
        unlab = build.build_dataset(cfg["data"]["train_unlab"], rng=rng)
        ck = dict(cfg["data"].get("collate", {}))
        from detmatch_tpu.data.collate import collate_view
        val = None
        if cfg["data"].get("val") and cfg.get("evaluation"):
            val = build.build_dataset(cfg["data"]["val"], rng=rng)
        train_ssl(ssl, vox, lab, unlab,
                  lambda s: collate_ts(s, **ck), work_dir,
                  max_iters=cfg.get("max_iters", 5000),
                  batch_size=cfg.get("batch_size", 4),
                  lr_3d=cfg.get("lr_3d"), lr_2d=cfg.get("lr_2d"),
                  lr_scale=cfg.get("autoscale_lr_factor", 1.0),
                  num_unlabeled=cfg.get("num_unlabeled_samples", 1),
                  seed=args.seed, resume_from=args.resume_from,
                  load_from=cfg.get("load_from"),
                  load_from_with_optimizer=(
                      args.load_from_with_optimizer
                      or cfg.get("load_from_with_optimizer")),
                  log_interval=cfg.get("log_interval", 10),
                  ckpt_interval=cfg.get("ckpt_interval", 5000),
                  val_dataset=val,
                  val_collate_fn=lambda s: collate_view(s, **ck),
                  eval_interval=(cfg.get("evaluation") or {}).get(
                      "interval"),
                  profile_dir=cfg.get("profile_dir"),
                  vis_interval=cfg.get("vis_interval"),
                  tensorboard=cfg.get("tensorboard", False),
                  ckpt_meta=dict(
                      classes=cfg.get("class_names",
                                      ("Pedestrian", "Cyclist", "Car")),
                      config_text=open(args.config).read()))
    elif task == "pretrain_3d":
        from detmatch_tpu.apis.train_pretrain import train_pvrcnn
        from detmatch_tpu.data.collate import collate_view
        from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
        model = PVRCNN(**cfg["model"]["detector_3d"])
        vox = build.build_voxelizer(cfg["voxelizer"])
        ds = build.build_dataset(cfg["data"]["train"], rng=rng)
        ck = dict(cfg["data"].get("collate", {}))
        train_pvrcnn(model, vox, ds, lambda s: collate_view(s, **ck),
                     work_dir, max_iters=cfg.get("max_iters", 1000),
                     base_lr=cfg.get("base_lr", 0.001),
                     batch_size=cfg.get("batch_size", 2), seed=args.seed)
    elif task == "pretrain_2d":
        from detmatch_tpu.apis.train_pretrain import train_frcnn
        from detmatch_tpu.data.collate import collate_view
        from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
        model = FasterRCNN(**cfg["model"]["detector_2d"])
        ds = build.build_dataset(cfg["data"]["train"], rng=rng)
        ck = dict(cfg["data"].get("collate", {}))
        train_frcnn(model, ds, lambda s: collate_view(s, **ck), work_dir,
                    max_iters=cfg.get("max_iters", 1000),
                    base_lr=cfg.get("base_lr", 0.02),
                    batch_size=cfg.get("batch_size", 2),
                    step_iters=cfg.get("step_iters", ()), seed=args.seed)
    else:
        raise ValueError(f"unknown task {task}")


if __name__ == "__main__":
    main()
