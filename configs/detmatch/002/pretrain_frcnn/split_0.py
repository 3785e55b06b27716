_base_ = "../../001/pretrain_frcnn/split_0.py"

frac = "002"
