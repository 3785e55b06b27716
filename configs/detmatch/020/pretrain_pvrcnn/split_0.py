_base_ = "../../001/pretrain_pvrcnn/split_0.py"

frac = "020"
