#!/usr/bin/env python
"""Evaluation CLI (reference ``tools/test.py``): load a checkpoint, run
inference over the val set, print KITTI AP metrics (SSL checkpoints fan out
teacher/student × 2d/3d).

Usage:
    python tools/test.py CONFIG CHECKPOINT_DIR [--eval kitti]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from detmatch_tpu.utils.env import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--eval", default="kitti")
    ap.add_argument("--out", default=None)
    ap.add_argument("--score-thr", type=float, default=None,
                    help="pre-NMS confidence floor override for both "
                         "branches (defaults: 0.1 3D / 0.05 2D)")
    ap.add_argument("--score-thr-3d", type=float, default=None,
                    help="3D-only floor override (wins over --score-thr; "
                         "the branches have asymmetric defaults)")
    ap.add_argument("--score-thr-2d", type=float, default=None,
                    help="2D-only floor override (wins over --score-thr)")
    ap.add_argument("--out-kitti", default=None, metavar="DIR",
                    help="also dump official KITTI-format result txts "
                         "(reference bbox2result_kitti submission path); "
                         "SSL checkpoints write tea.3d/ and stu.3d/ "
                         "subdirectories")
    args = ap.parse_args()

    from detmatch_tpu.apis import build
    from detmatch_tpu.apis.evaluate import (eval_frcnn, eval_pvrcnn,
                                            eval_ssl)
    from detmatch_tpu.config import Config
    from detmatch_tpu.data.collate import collate_view
    from detmatch_tpu.train import checkpoints

    cfg = Config.fromfile(args.config)
    rng = np.random.RandomState(0)
    ds = build.build_dataset(cfg["data"]["val"], rng=rng)
    ck = dict(cfg["data"].get("collate", {}))
    collate_fn = lambda s: collate_view(s, **ck)  # noqa: E731
    task = cfg.get("task", "ssl")
    step = checkpoints.latest_step(args.checkpoint)

    if task == "ssl":
        ssl = build.build_ssl(cfg)
        vox = build.build_voxelizer(cfg["voxelizer"])
        import jax
        first = collate_fn([ds[0], ds[0]])
        from detmatch_tpu.train.ssl_step import voxelize_views
        import jax.numpy as jnp
        v = voxelize_views(
            dict(lab=dict(stu=jax.tree.map(jnp.asarray, first))), vox)
        state = ssl.init_states(jax.random.PRNGKey(0), v["lab"]["stu"],
                                v["lab"]["stu"]["img"],
                                v["lab"]["stu"]["img_shape"])
        payload = checkpoints.restore(args.checkpoint, step,
                                      dict(state=state, opt_state=None))
        kw = {}
        thr3 = args.score_thr_3d if args.score_thr_3d is not None \
            else args.score_thr
        thr2 = args.score_thr_2d if args.score_thr_2d is not None \
            else args.score_thr
        if thr3 is not None:
            kw["score_thresh_3d"] = thr3
        if thr2 is not None:
            kw["score_thr_2d"] = thr2
        if args.out_kitti:
            res, dets = eval_ssl(ssl, payload["state"], ds, collate_fn,
                                 vox, return_dets=True, **kw)
            from detmatch_tpu.eval.kitti_format import write_submission
            for key in ("tea.3d", "stu.3d"):
                write_submission(dets[key], ds.infos,
                                 os.path.join(args.out_kitti, key))
            print(f"KITTI submission written to {args.out_kitti}")
        else:
            res = eval_ssl(ssl, payload["state"], ds, collate_fn, vox,
                           **kw)
    elif task == "pretrain_3d":
        from detmatch_tpu.models.pvrcnn.pvrcnn import PVRCNN
        model = PVRCNN(**cfg["model"]["detector_3d"])
        vox = build.build_voxelizer(cfg["voxelizer"])
        import jax
        payload = checkpoints.restore(args.checkpoint, step,
                                      dict(model=None))
        thr3 = args.score_thr_3d if args.score_thr_3d is not None \
            else args.score_thr
        kw = {} if thr3 is None else dict(score_thresh=thr3)
        res, dets = eval_pvrcnn(model, payload["model"], ds, collate_fn,
                                vox, **kw)
        if args.out_kitti:
            from detmatch_tpu.eval.kitti_format import write_submission
            write_submission(dets, ds.infos, args.out_kitti)
            print(f"KITTI submission written to {args.out_kitti}")
    else:
        from detmatch_tpu.models.frcnn.faster_rcnn import FasterRCNN
        model = FasterRCNN(**cfg["model"]["detector_2d"])
        payload = checkpoints.restore(args.checkpoint, step,
                                      dict(model=None))
        thr2 = args.score_thr_2d if args.score_thr_2d is not None \
            else args.score_thr
        kw = {} if thr2 is None else dict(score_thr=thr2)
        res, _ = eval_frcnn(model, payload["model"], ds, collate_fn,
                            **kw)

    for k in sorted(res):
        print(f"{k}: {res[k]:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
