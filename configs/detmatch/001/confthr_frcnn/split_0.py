"""ConfThr 2D baseline: EMA teacher + score-0.7 pseudo labels, no fusion
(reference ``configs/detmatch/001/confthr_frcnn/split_0.py:299-305``)."""

_base_ = "../detmatch/split_0.py"

ssl = dict(
    enable_3d=False,
    fusion=False,
    consistency=False,
    pseudo_score_thr_2d=0.7,
)
