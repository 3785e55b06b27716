_base_ = "../../001/pretrain_frcnn/split_2.py"

frac = "020"
