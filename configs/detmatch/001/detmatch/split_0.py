"""DetMatch joint 2D+3D SSL, 1% labels, split 0 (reference
``configs/detmatch/001/detmatch/split_0.py``)."""

_base_ = "../../../_base_/kitti_detmatch.py"

task = "ssl"
split = 0
frac = "001"
# pathname fraction, formatted the way the reference formats split_frac
# ('{}'.format(0.01) -> "0.01"; README.md:36-38 filenames)
frac_path = "0.01"
data_root = "data/kitti/"
train_lab_info = ("ssl_splits/"
                  "kitti_infos_train_proj_3d_lab_{frac_path}_{split}.pkl")
train_unlab_info = ("ssl_splits/"
                    "kitti_infos_train_unlab_{frac_path}_{split}.pkl")

batch_size = 4
num_unlabeled_samples = 1
max_iters = 5000

ssl = dict(
    ema_decay=0.999,
    true_avg_rampup=True,
    rampup_start_decay=0.99,
    ssl_weight=1.0,
    score_filter_3d=0.1,
    score_filter_2d=0.1,
    cost_thr=-1.5,
    pseudo_score_thr_3d=0.1,
    pseudo_score_thr_2d=0.1,
    hard_pseudo_2d_weight=4.0,
    consistency_weights=(2.0, 20.0, 2.0),
)

load_from = dict(
    det3d="work_dirs/pretrain_pvrcnn_001_split0/ckpt",
    det2d="work_dirs/pretrain_frcnn_001_split0/ckpt",
)

data = dict(
    collate=dict(max_points=18000, max_gt=40),
    train_lab=dict(
        type="TSDataset",
        dataset=dict(
            type="KittiDataset", data_root=data_root,
            ann_file=data_root + train_lab_info,
            completely_remove_other_classes=True, repeat=100),
        shared_pipeline="${shared_pipeline}",
        student_pipeline="${student_pipeline}",
        teacher_pipeline="${teacher_pipeline}",
    ),
    train_unlab=dict(
        type="TSDataset",
        dataset=dict(
            type="KittiDataset", data_root=data_root,
            ann_file=data_root + train_unlab_info,
            completely_remove_other_classes=True, filter_empty_gt=False),
        shared_pipeline="${shared_pipeline_nosample}",
        student_pipeline="${student_pipeline}",
        teacher_pipeline="${teacher_pipeline}",
    ),
    val=dict(
        type="KittiDataset", data_root=data_root,
        ann_file=data_root + "kitti_infos_val.pkl",
        test_mode=True, pipeline="${test_pipeline}",
    ),
)
