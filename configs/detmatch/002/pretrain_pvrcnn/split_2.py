_base_ = "../../001/pretrain_pvrcnn/split_2.py"

frac = "002"
frac_path = "0.02"
