"""Faster R-CNN supervised pretrain, 1% labels, split 0
(reference ``configs/detmatch/001/pretrain_frcnn/split_0.py``:
SGD lr 0.02·bs/2, 12 epochs, step [8, 10])."""

_base_ = "../../../_base_/kitti_detmatch.py"

task = "pretrain_2d"
split = 0
frac = "001"
frac_path = "0.01"  # reference filename fraction (README.md:36-38)
data_root = "data/kitti/"

batch_size = 2
base_lr = 0.02
max_iters = 1110  # ≈ 12 epochs × 185 frames / bs 2
step_iters = (740, 925)  # epochs 8, 10

data = dict(
    collate=dict(max_points=18000, max_gt=40),
    train=dict(
        type="KittiDataset", data_root=data_root,
        ann_file=(data_root
                  + "ssl_splits/kitti_infos_train_proj_3d_lab_"
                  + "{frac_path}_{split}.pkl"),
        completely_remove_other_classes=True,
        pipeline="${pretrain2d_pipeline}",
    ),
    val=dict(
        type="KittiDataset", data_root=data_root,
        ann_file=data_root + "kitti_infos_val.pkl",
        test_mode=True, pipeline="${test_pipeline}",
    ),
)

pretrain2d_pipeline = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    # full reference multiscale range (pretrain_frcnn/split_0.py:73-74
    # img_scale [(640,192),(2560,768)]); samples that exceed the static
    # canvas are squashed back to fit by PadToCanvas (scale recorded) —
    # the canvas, not the range, is the binding constraint. Set
    # canvas=(768, 2560) for the reference's full upscale headroom.
    dict(type="Resize", img_scale=((640, 192), (2560, 768))),
    dict(type="RandomFlip3D", flip_ratio=0.5),
    dict(type="Normalize"),
    dict(type="PadToCanvas", canvas=(384, 1280)),
]
