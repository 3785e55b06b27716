"""PV-RCNN supervised pretrain, 1% labels, split 0
(reference ``configs/detmatch/001/pretrain_pvrcnn/split_0.py``:
AdamW lr 1e-3·bs/2, 40 epochs cyclic LR)."""

_base_ = "../../../_base_/kitti_detmatch.py"

task = "pretrain_3d"
split = 0
frac = "001"
frac_path = "0.01"  # reference filename fraction (README.md:36-38)
data_root = "data/kitti/"

batch_size = 2
base_lr = 0.001
max_iters = 7400  # ≈ 40 epochs × 185 labeled frames / bs 2

data = dict(
    collate=dict(max_points=18000, max_gt=40),
    train=dict(
        type="KittiDataset", data_root=data_root,
        ann_file=(data_root
                  + "ssl_splits/kitti_infos_train_proj_3d_lab_"
                  + "{frac_path}_{split}.pkl"),
        completely_remove_other_classes=True,
        pipeline="${pretrain3d_pipeline}",
    ),
    val=dict(
        type="KittiDataset", data_root=data_root,
        ann_file=data_root + "kitti_infos_val.pkl",
        test_mode=True, pipeline="${test_pipeline}",
    ),
)

pretrain3d_pipeline = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    dict(type="ObjectSample", db_sampler=dict(
        info_path=("ssl_splits/kitti_dbinfos_train_lab_"
                   "{frac_path}_{split}.pkl"),
        classes=["Pedestrian", "Cyclist", "Car"],
        sample_groups=dict(Car=15, Pedestrian=10, Cyclist=10),
        filter_by_min_points=dict(Car=5, Pedestrian=5, Cyclist=5))),
    dict(type="RandomFlip3D", flip_ratio=0.5),
    dict(type="GlobalRotScaleTrans",
         rot_range=(-0.78539816, 0.78539816),
         scale_ratio_range=(0.95, 1.05)),
    dict(type="PointsRangeFilter",
         point_cloud_range=[0.0, -40.0, -3.0, 70.4, 40.0, 1.0]),
    dict(type="ObjectRangeFilter",
         point_cloud_range=[0.0, -40.0, -3.0, 70.4, 40.0, 1.0]),
    dict(type="PointShuffle"),
    dict(type="Normalize"),
    dict(type="PadToCanvas", canvas=(384, 1280)),
]
