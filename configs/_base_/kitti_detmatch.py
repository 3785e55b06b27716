"""Shared KITTI + DetMatch model fragments (mirrors the reference's
config idiom; values from ``configs/detmatch/001/detmatch/split_0.py``)."""

class_names = ["Pedestrian", "Cyclist", "Car"]
point_cloud_range = [0.0, -40.0, -3.0, 70.4, 40.0, 1.0]
voxel_size = [0.05, 0.05, 0.1]
data_root = "data/kitti/"

voxelizer = dict(
    point_cloud_range=point_cloud_range,
    voxel_size=voxel_size,
    max_voxels=16000,
    max_points=5,
)

model = dict(
    detector_3d=dict(
        num_classes=3,
        point_cloud_range=tuple(point_cloud_range),
        voxel_size=tuple(voxel_size),
        grid_size=(1408, 1600, 40),
        num_keypoints=2048,
        backbone_caps=(24000, 16000, 10000, 10000),
    ),
    detector_2d=dict(
        num_classes=3,
        canvas=(384, 1280),
    ),
)

img_norm = dict(mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0])

shared_pipeline = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    dict(type="ObjectSample", db_sampler=dict(
        info_path=("ssl_splits/kitti_dbinfos_train_lab_"
                   "{frac_path}_{split}.pkl"),
        classes=class_names,
        sample_groups=dict(Car=15, Pedestrian=10, Cyclist=10),
        filter_by_min_points=dict(Car=5, Pedestrian=5, Cyclist=5),
    )),
    # full reference multiscale range (pretrain_frcnn/split_0.py:73-74
    # img_scale [(640,192),(2560,768)]); samples that exceed the static
    # canvas are squashed back to fit by PadToCanvas (scale recorded) —
    # the canvas, not the range, is the binding constraint. Set
    # canvas=(768, 2560) for the reference's full upscale headroom.
    dict(type="Resize", img_scale=((640, 192), (2560, 768))),
    dict(type="RandomFlip3D", flip_ratio=0.5),
]

shared_pipeline_nosample = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    # full reference multiscale range (pretrain_frcnn/split_0.py:73-74
    # img_scale [(640,192),(2560,768)]); samples that exceed the static
    # canvas are squashed back to fit by PadToCanvas (scale recorded) —
    # the canvas, not the range, is the binding constraint. Set
    # canvas=(768, 2560) for the reference's full upscale headroom.
    dict(type="Resize", img_scale=((640, 192), (2560, 768))),
    dict(type="RandomFlip3D", flip_ratio=0.5),
]

student_pipeline = [
    dict(type="GlobalRotScaleTrans",
         rot_range=(-0.78539816, 0.78539816),
         scale_ratio_range=(0.95, 1.05)),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="PointShuffle"),
    dict(type="PhotoMetricAugs"),
    dict(type="Normalize", **img_norm),
    dict(type="PadToCanvas", canvas=(384, 1280)),
]

teacher_pipeline = [
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="PointShuffle"),
    dict(type="Normalize", **img_norm),
    dict(type="PadToCanvas", canvas=(384, 1280)),
]

test_pipeline = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="Normalize", **img_norm),
    dict(type="PadToCanvas", canvas=(384, 1280)),
]
