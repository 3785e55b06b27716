"""ConfThr 3D baseline: EMA teacher + score-0.3 pseudo labels, no fusion
(reference ``configs/detmatch/001/confthr_pvrcnn/split_0.py:291-295``)."""

_base_ = "../detmatch/split_0.py"

ssl = dict(
    enable_2d=False,
    fusion=False,
    consistency=False,
    pseudo_score_thr_3d=0.3,
)
