"""Tiny SSL config for smoke-driving tools/train.py on fixture data.

Not a benchmark config — shapes are minimized so the step compiles fast.
data_root is expected to be overridden via --cfg-options.
"""

task = "ssl"
data_root = "data/kitti_tiny/"
batch_size = 1
num_unlabeled_samples = 1
max_iters = 3

point_cloud_range = [0.0, -8.0, -3.0, 16.0, 8.0, 1.0]

voxelizer = dict(point_cloud_range=point_cloud_range,
                 voxel_size=[0.5, 0.5, 0.1], max_voxels=384, max_points=5)

model = dict(
    detector_3d=dict(
        num_classes=3, point_cloud_range=tuple(point_cloud_range),
        voxel_size=(0.5, 0.5, 0.1), grid_size=(32, 32, 40),
        num_keypoints=32, backbone_caps=(384, 384, 256, 256),
        train_nms=dict(nms_pre=128, nms_post=24, nms_thresh=0.8),
        test_nms=dict(nms_pre=128, nms_post=12, nms_thresh=0.7)),
    detector_2d=dict(
        num_classes=3, canvas=(64, 128), train_rpn_nms_pre=96,
        train_rpn_max=48, test_rpn_nms_pre=96, test_rpn_max=24,
        rcnn_num_samples=24),
)

ssl = dict(max_pseudo_gt=16)

_pipe_common = [
    dict(type="LoadImage"),
    dict(type="LoadPoints", load_dim=4, use_dim=4),
    dict(type="Resize", img_scale=((64, 24), (128, 48))),
    dict(type="RandomFlip3D", flip_ratio=0.5),
]
_stu = [
    dict(type="GlobalRotScaleTrans"),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="Normalize"),
    dict(type="PadToCanvas", canvas=(64, 128)),
]
_tea = [
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="Normalize"),
    dict(type="PadToCanvas", canvas=(64, 128)),
]

data = dict(
    collate=dict(max_points=256, max_gt=6),
    train_lab=dict(
        type="TSDataset",
        dataset=dict(type="KittiDataset", data_root=data_root,
                     ann_file=data_root + "kitti_infos_train.pkl",
                     completely_remove_other_classes=True, repeat=10),
        shared_pipeline=_pipe_common, student_pipeline=_stu,
        teacher_pipeline=_tea),
    train_unlab=dict(
        type="TSDataset",
        dataset=dict(type="KittiDataset", data_root=data_root,
                     ann_file=data_root + "kitti_infos_train.pkl",
                     filter_empty_gt=False),
        shared_pipeline=_pipe_common, student_pipeline=_stu,
        teacher_pipeline=_tea),
    val=dict(type="KittiDataset", data_root=data_root,
             ann_file=data_root + "kitti_infos_train.pkl",
             test_mode=True,
             pipeline=[dict(type="LoadImage"),
                       dict(type="LoadPoints", load_dim=4, use_dim=4),
                       dict(type="PointsRangeFilter",
                            point_cloud_range=point_cloud_range),
                       dict(type="Normalize"),
                       dict(type="PadToCanvas", canvas=(64, 128))]),
)

evaluation = dict(interval=3)
ckpt_interval = 3
