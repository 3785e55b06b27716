_base_ = "../../001/pretrain_pvrcnn/split_1.py"

frac = "002"
