_base_ = "../../001/detmatch/split_0.py"

frac = "002"
