"""Proof the SSL machinery LEARNS, end to end, on synthetic data.

The unit/equality tests prove single-step mechanics; this study proves
optimization works through the full pipeline (reference capability: the
trained-model tables, ``README.md:112-124``). On a generated mini-KITTI
tree (randomized scenes, held-out val split — ``tests/kitti_fixture.py``
``make_kitti_random``) it runs, at tiny-config scale:

  A. labeled-only: the SSL loop with ``ssl_weight=0`` (pure supervised
     signal on the labeled split) for N iters;
  B. DetMatch SSL: the full loop (teacher pseudo-labels, fusion,
     consistency, EMA) on labeled + unlabeled splits for N iters,
     bootstrapped from run A's midpoint checkpoint the way the
     reference bootstraps SSL from pretrained detectors
     (``load_from`` rule) — here both runs just start from the same
     random init to keep the study self-contained;

and evaluates {init, A, B} × {student, teacher} on the held-out val
split with the real KITTI AP-R40 evaluator. Success criteria (asserted):

  * train loss decreases (first-quartile mean > last-quartile mean);
  * final 3D mAP(moderate) of run B's teacher > mAP at init;
  * final 3D mAP(moderate) of run B's teacher >= run A's student
    (the SSL machinery extracts signal from the unlabeled split).

Writes ``docs/learning_study.json`` with the curves + APs. Run:
    python tools/misc/learning_study.py [--iters N]   # TPU (~0.35 s/iter)
    DETMATCH_PLATFORM=cpu ... # CPU fallback (~70 s/iter on 1 core)
"""
import argparse
import json
import os
import pickle
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from detmatch_tpu.utils.env import setup_jax  # noqa: E402

# honors DETMATCH_PLATFORM / JAX_PLATFORMS (sitecustomize imports jax
# before env vars can take effect, so the explicit config call is the
# only reliable platform switch) and sets up the host-keyed cache
jax = setup_jax()


def make_data(root):
    """lab(6) / unlab(24) / val(8) randomized scenes + info pkls.

    Idempotent: pre-existing info pkls under ``root`` (a ``--data-root``
    rerun after a crash) are reused as-is.
    """
    from kitti_fixture import make_kitti_random
    from detmatch_tpu.data import kitti

    # 12 labeled scenes: at 6, the trained model plateaus at val IoU3D
    # ~0.3-0.5 per GT (measured round 5) — real localization but under
    # KITTI's 0.7 Car bar, so mAP_3d stays an uninformative 0.0
    specs = dict(lab=(12, 0, 0), unlab=(24, 100, 200), val=(8, 500, 400))
    paths = {}
    for name, (n, seed, start) in specs.items():
        p = os.path.join(root, f"kitti_infos_{name}.pkl")
        if not os.path.exists(p):
            # Cars only, denser scenes: the toy task must be GEOMETRICALLY
            # learnable at tiny-config resolution. The round-3/round-4
            # all-classes runs collapsed to all-background with
            # rcnn_loss_reg == 0 for all 600 iters: sub-meter objects
            # (Ped/Cyc) on the 1 m anchor grid never produce a proposal
            # above reg_fg_thresh 0.55, and their ~5 px projected boxes
            # never match a 2D anchor, so the only consistent labels are
            # "background". Car-sized objects make the production
            # assignment thresholds reachable.
            # near-axis yaws, like real KITTI traffic: the production
            # anchor recipe (rotations 0/pi/2, matched_threshold 0.6)
            # assumes it. Uniform +-pi yaws leave most GTs with no
            # above-threshold anchor -> RPN cls plateaus (~0.48) -> RoI
            # IoU soft labels go all-background -> the RCNN confidently
            # scores everything ~0 (observed at 3000 iters).
            split = make_kitti_random(root, n, seed=seed, split=name,
                                      start_idx=start, max_objects=4,
                                      classes=("Car",),
                                      yaw_range=(-0.35, 0.35))
            infos = kitti.create_infos(root, split, training=True)
            with open(p, "wb") as f:
                pickle.dump(infos, f)
        paths[name] = p
    return paths


def build_cfg(root, paths, iters, ssl_weight, work_dir, seed):
    from detmatch_tpu.config import Config

    cfg = Config.fromfile(os.path.join(REPO, "configs/tests/ssl_tiny.py"))
    d = cfg["data"]
    for split, key in (("train_lab", "lab"), ("train_unlab", "unlab")):
        d[split]["dataset"]["data_root"] = root
        d[split]["dataset"]["ann_file"] = paths[key]
    d["val"]["data_root"] = root
    d["val"]["ann_file"] = paths["val"]
    # --- make the toy task LEARNABLE (ssl_tiny is a compile-smoke
    # config, not a learning config) ---
    # 1. ssl_tiny's collate max_points=256 truncates the fixture clouds
    #    (~2500 bg points first, object points appended last) down to
    #    pure background: zero points remained inside any gt box.
    cfg["data"]["collate"]["max_points"] = 4096
    # 2. ssl_tiny's 0.5 m voxels give a 4x4 BEV anchor grid (4 m anchor
    #    spacing) for 0.6-3.9 m objects: best anchor-gt IoU ~0, so only
    #    force-matches train regression and decode never reaches IoU>0.
    #    0.125 m voxels -> 16x16 BEV -> 1 m anchor spacing.
    vs = [0.125, 0.125, 0.1]
    pcr = cfg["point_cloud_range"]
    cfg["voxelizer"] = dict(point_cloud_range=pcr, voxel_size=vs,
                            max_voxels=4096, max_points=5)
    m3 = cfg["model"]["detector_3d"]
    m3["voxel_size"] = tuple(vs)
    m3["grid_size"] = (128, 128, 40)
    # enough FPS keypoints that every car's RoI grid pools real points
    m3["num_keypoints"] = 128
    # capacity must FOLLOW max_voxels: ssl_tiny's 384-voxel backbone cap
    # silently truncated the 4096-voxel scenes to a spatially-biased
    # 384-voxel strip (sorted-key order), hiding most objects from the
    # network — the round-4 study's 3D branch could not converge its
    # localization because the supervision was inconsistent scene to
    # scene (rpn_loss_loc flat ~0.8 with 2.4→15 loss spikes)
    m3["backbone_caps"] = (4096, 4096, 2048, 2048)
    # 3. ssl_tiny's 64x128 canvas shrinks the fixture's 375x1242 images
    #    ~10x: a projected car becomes ~20 px, below the smallest 2D
    #    anchor (32 px at stride 4 x scale 8), so the 2D RPN has zero
    #    positive anchors (observed: sup.2d.loss_rpn_bbox == 0 for the
    #    whole round-4 run) and the 2D branch learns all-background.
    #    96x320 (scale ~0.25) puts cars at ~60-90 px — inside the
    #    anchor pyramid.
    canvas = (96, 320)
    cfg["model"]["detector_2d"]["canvas"] = canvas
    scale_wh = (canvas[1], canvas[0])
    for split in ("train_lab", "train_unlab"):
        for key in ("shared_pipeline", "student_pipeline",
                    "teacher_pipeline"):
            for step in d[split].get(key, []):
                if step.get("type") == "Resize":
                    step["img_scale"] = (scale_wh, scale_wh)
                if step.get("type") == "PadToCanvas":
                    step["canvas"] = canvas
                # 4. tame the 3D augmentation for the toy budget: a fixed
                #    batch overfits in ~25 iters (rpn_loss_loc 0.95→0.13,
                #    tools-side probe), but the production ±45° global
                #    rotation re-randomizes anchor assignments every iter
                #    and 6 scenes x 1200 iters cannot average over that
                #    churn (observed: rpn losses flat at their plateau).
                #    Small ranges keep the aug-record flow exercised.
                if step.get("type") == "GlobalRotScaleTrans":
                    step["rot_range"] = (-0.15, 0.15)
                    step["scale_ratio_range"] = (0.98, 1.02)
    for step in d["val"]["pipeline"]:
        if step.get("type") == "PadToCanvas":
            step["canvas"] = canvas
    cfg["max_iters"] = iters
    cfg["batch_size"] = 2
    cfg["num_unlabeled_samples"] = 2
    cfg["log_interval"] = max(1, iters // 40)
    # checkpoint periodically: the axon tunnel can hang mid-run and a
    # kill leaks the chip grant — resume from the last quarter instead
    # of retraining (make_data/--data-root reuse makes reruns cheap)
    cfg["ckpt_interval"] = max(1, iters // 4)
    cfg["evaluation"] = None
    cfg["ssl"] = dict(cfg.get("ssl", {}), ssl_weight=ssl_weight,
                      # ramp SSL in over the first third, like the
                      # reference's rampup recipe
                      ssl_weight_rampup_start_iter=0,
                      ssl_weight_rampup_num_iter=max(1, iters // 3))
    cfg["work_dir"] = work_dir
    return cfg


def run_training(cfg, seed=0):
    from detmatch_tpu.apis import build
    from detmatch_tpu.apis.train_ssl import train_ssl
    from detmatch_tpu.data.collate import collate_ts, collate_view

    rng = np.random.RandomState(seed)
    ssl = build.build_ssl(cfg)
    vox = build.build_voxelizer(cfg["voxelizer"])
    lab = build.build_dataset(cfg["data"]["train_lab"], rng=rng)
    unlab = build.build_dataset(cfg["data"]["train_unlab"], rng=rng)
    ck = dict(cfg["data"].get("collate", {}))
    # Crash resilience: a prior run's checkpoint resumes (at
    # step == max_iters the loop body runs zero times and returns the
    # restored state), so a transient eval failure never re-trains.
    from detmatch_tpu.train import checkpoints
    ckpt_dir = os.path.join(cfg["work_dir"], "ckpt")
    resume = ckpt_dir if checkpoints.latest_step(ckpt_dir) else None
    if resume:
        print(f"[train] resuming from {ckpt_dir} @ "
              f"{checkpoints.latest_step(ckpt_dir)}", flush=True)
    # Explicit small LRs: train_ssl's batch-scaled defaults target
    # production batch sizes; at this toy scale they diverge (observed:
    # AdamW@0.03 blows the RPN logits to ~8e3 and the RCNN head
    # collapses to all-background → AP 0).
    # LR/warmup at toy scale: the production 500-iter warmup +
    # conservative LRs leave the anchor head's localization unconverged
    # inside the study budget (round-4 diagnosis: rpn_loss_loc flat at
    # ~0.6-0.7 for 600 iters, best RoI IoU ~0.2 even on TRAIN scenes →
    # rcnn correctly learns "all background" → zero detections). The
    # reference never trains PV-RCNN from scratch in-SSL either — it
    # pretrains 3D for 40 epochs at cyclic LR up to 1e-2 first
    # (pretrain_pvrcnn/split_0.py:320-346); these settings give the toy
    # run an equivalent optimization budget.
    state = train_ssl(
        ssl, vox, lab, unlab, lambda s: collate_ts(s, **ck),
        cfg["work_dir"], max_iters=cfg["max_iters"],
        batch_size=cfg["batch_size"],
        lr_3d=cfg.get("lr_3d", 4e-3), lr_2d=cfg.get("lr_2d", 1e-2),
        num_unlabeled=cfg["num_unlabeled_samples"], seed=seed,
        log_interval=cfg["log_interval"],
        ckpt_interval=cfg["ckpt_interval"], resume_from=resume,
        warmup_iters=cfg.get("warmup_iters",
                             max(50, cfg["max_iters"] // 10)))
    return ssl, vox, jax.device_get(state)


def recalibrate(cfg, ssl, vox, state, passes=300):
    """Refresh BN running stats before eval (frozen params).

    The BN momentum (0.01) gives running statistics a ~100-iteration
    window; at study horizons the window covers a still-moving training
    phase, so eval-mode forwards see stale statistics (diagnosed: eval
    proposals degenerate while train-mode forwards on the same inputs
    hit IoU3D 0.95). The reference never faces this because it
    pretrains 30k-60k iterations. Standard BN recalibration: forward
    passes only, `apis.evaluate.recalibrate_batch_stats`."""
    from detmatch_tpu.apis import build
    from detmatch_tpu.apis.evaluate import recalibrate_batch_stats
    from detmatch_tpu.data.collate import collate_ts
    from detmatch_tpu.train.ssl_step import voxelize_views
    import jax.numpy as jnp

    rng = np.random.RandomState(123)
    lab = build.build_dataset(cfg["data"]["train_lab"], rng=rng)
    ck = dict(cfg["data"].get("collate", {}))
    n = len(lab)
    batches = []
    for s0 in range(0, min(n, 8), 2):
        b = collate_ts([lab[s0], lab[(s0 + 1) % n]], **ck)
        full = dict(lab=jax.tree.map(jnp.asarray, b),
                    unlab=jax.tree.map(jnp.asarray, b))
        batches.append(voxelize_views(full, vox)["lab"]["stu"])
    state = jax.tree.map(lambda x: x, state)  # shallow copy
    for branch in ("student", "teacher"):
        state[branch] = dict(state[branch])
        state[branch]["det3d"] = jax.device_get(recalibrate_batch_stats(
            ssl.pvrcnn, state[branch]["det3d"], batches, passes=passes))
    print(f"[recal] BN stats refreshed ({passes} passes)", flush=True)
    return state


# low score floors: AP sweeps thresholds, and a tiny-config model's
# calibrated scores can sit below the production 0.1 floor — which
# truncates the PR curve to a hard AP=0 (the exact failure the 600-iter
# round-3 study hit: loss 8.9→1.3 but every AP 0.0 because no detection
# cleared the floor). Echoed into the report JSON so its APs are never
# silently compared against production evals run at the 0.1/0.05
# defaults.
SCORE_THRESH_3D = 0.01
SCORE_THR_2D = 0.01


def run_eval(cfg, ssl, vox, state, attempts=3, cache=None, cache_key=None):
    from detmatch_tpu.apis import build
    from detmatch_tpu.apis.evaluate import eval_ssl
    from detmatch_tpu.data.collate import collate_view

    # Crash resilience: evals of completed stages are pure functions of
    # (data, checkpoint, floors) — persist them under the data root so a
    # rerun after a tunnel hang re-evaluates only what it retrained.
    # The floors are folded into the key so a rerun after changing
    # SCORE_THRESH_3D/SCORE_THR_2D never reuses stale APs.
    if cache_key:
        # 'r1' = BN-recalibrated eval protocol (invalidates pre-recal
        # cached APs)
        cache_key = f"{cache_key}@f{SCORE_THRESH_3D}/{SCORE_THR_2D}r1"
    if cache and cache_key:
        path = os.path.join(cache, "evals.json")
        stored = {}
        if os.path.exists(path):
            with open(path) as f:
                stored = json.load(f)
        if cache_key in stored:
            print(f"[eval] reusing cached result {cache_key!r}",
                  flush=True)
            return stored[cache_key]
    val = build.build_dataset(cfg["data"]["val"],
                              rng=np.random.RandomState(0))
    ck = dict(cfg["data"].get("collate", {}))
    for a in range(attempts):
        try:
            res = eval_ssl(ssl, state, val,
                           lambda s: collate_view(s, **ck), vox,
                           score_thresh_3d=SCORE_THRESH_3D,
                           score_thr_2d=SCORE_THR_2D)
            break
        except jax.errors.JaxRuntimeError as e:
            # the remote-compile tunnel occasionally drops mid-read;
            # the computation is pure, so retrying is safe
            if a == attempts - 1:
                raise
            print(f"[eval] transient backend failure (attempt {a + 1}):"
                  f" {e}; retrying", flush=True)
    if cache and cache_key:
        stored[cache_key] = {k: float(v) for k, v in res.items()}
        with open(path, "w") as f:
            json.dump(stored, f)
    return res


def init_state(cfg, seed=0):
    from detmatch_tpu.apis import build
    from detmatch_tpu.data.collate import collate_ts
    from detmatch_tpu.train.ssl_step import voxelize_views

    rng = np.random.RandomState(seed)
    ssl = build.build_ssl(cfg)
    vox = build.build_voxelizer(cfg["voxelizer"])
    lab = build.build_dataset(cfg["data"]["train_lab"], rng=rng)
    ck = dict(cfg["data"].get("collate", {}))
    batch = collate_ts([lab[0], lab[1]], **ck)
    full = dict(lab=batch, unlab=batch)
    lab3d = voxelize_views(full, vox)["lab"]["stu"]
    state = ssl.init_states(jax.random.PRNGKey(seed), lab3d,
                            lab3d["img"], lab3d["img_shape"])
    return ssl, vox, jax.device_get(state)


def loss_curve(work_dir):
    losses = []
    with open(os.path.join(work_dir, "log.json")) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            e = json.loads(line)
            if e.get("mode") == "train":
                losses.append((e["iter"], float(e["loss"])))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "learning_study.json"))
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--data-root", default=None,
                    help="reuse an existing study tree (data + "
                         "checkpoints) from a crashed run; implies "
                         "--keep")
    args = ap.parse_args()

    if args.data_root:
        root = args.data_root.rstrip("/") + "/"
        args.keep = True
    else:
        root = tempfile.mkdtemp(prefix="learn_kitti_") + "/"
    print(f"[data] generating under {root}", flush=True)
    paths = make_data(root)

    wd_a = os.path.join(root, "run_labonly")
    wd_b = os.path.join(root, "run_ssl")
    cfg_a = build_cfg(root, paths, args.iters, 0.0, wd_a, seed=0)
    cfg_b = build_cfg(root, paths, args.iters, 1.0, wd_b, seed=0)

    cache = root if args.keep else None
    print("[eval] init", flush=True)
    ssl0, vox0, st0 = init_state(cfg_b, seed=0)
    ap_init = run_eval(cfg_b, ssl0, vox0, st0, cache=cache,
                       cache_key="init")

    print(f"[train] A: labeled-only, {args.iters} iters", flush=True)
    ssl_a, vox_a, st_a = run_training(cfg_a, seed=0)
    st_a = recalibrate(cfg_a, ssl_a, vox_a, st_a)
    ap_a = run_eval(cfg_a, ssl_a, vox_a, st_a, cache=cache,
                    cache_key=f"labonly@{args.iters}")

    print(f"[train] B: DetMatch SSL, {args.iters} iters", flush=True)
    ssl_b, vox_b, st_b = run_training(cfg_b, seed=0)
    st_b = recalibrate(cfg_b, ssl_b, vox_b, st_b)
    ap_b = run_eval(cfg_b, ssl_b, vox_b, st_b, cache=cache,
                    cache_key=f"ssl@{args.iters}")

    key = "3d.mAP_3d_moderate"
    curve_a, curve_b = loss_curve(wd_a), loss_curve(wd_b)

    def quartile_means(curve):
        v = np.array([l for _, l in curve])
        q = max(1, len(v) // 4)
        return float(v[:q].mean()), float(v[-q:].mean())

    # loss-decrease is judged on run A (pure supervised): run B's total
    # loss is confounded by the SSL weight ramping IN over training
    first_a, last_a = quartile_means(curve_a)
    report = dict(
        iters=args.iters,
        score_thresh_3d=SCORE_THRESH_3D, score_thr_2d=SCORE_THR_2D,
        loss_first_quartile=first_a, loss_last_quartile=last_a,
        ap_init={k: v for k, v in ap_init.items() if "mAP" in k or "num_dets" in k},
        ap_labonly={k: v for k, v in ap_a.items() if "mAP" in k or "num_dets" in k},
        ap_ssl={k: v for k, v in ap_b.items() if "mAP" in k or "num_dets" in k},
        curve_labonly=curve_a, curve_ssl=curve_b,
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("curve")}, indent=1),
          flush=True)

    init_m = ap_init[f"tea.{key}"]
    a_m = max(ap_a[f"stu.{key}"], ap_a[f"tea.{key}"])
    b_m = max(ap_b[f"stu.{key}"], ap_b[f"tea.{key}"])
    print(f"3D mAP(mod): init {init_m:.2f} | labeled-only {a_m:.2f} | "
          f"SSL {b_m:.2f}", flush=True)
    ok = (last_a < first_a) and (b_m > init_m) and (b_m >= a_m)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    if not ok:
        print("LEARNING CHECK FAILED", flush=True)
        sys.exit(1)
    print("LEARNING CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
