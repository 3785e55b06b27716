_base_ = "../../001/pretrain_frcnn/split_1.py"

frac = "002"
