_base_ = "../../001/pretrain_frcnn/split_2.py"

frac = "002"
frac_path = "0.02"
