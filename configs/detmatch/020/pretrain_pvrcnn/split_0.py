_base_ = "../../001/pretrain_pvrcnn/split_0.py"

frac = "020"
frac_path = "0.2"
