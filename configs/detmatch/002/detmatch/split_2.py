_base_ = "../../001/detmatch/split_2.py"

frac = "002"
