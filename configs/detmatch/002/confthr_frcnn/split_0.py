_base_ = "../../001/confthr_frcnn/split_0.py"

frac = "002"
frac_path = "0.02"
