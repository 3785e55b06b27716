_base_ = "../../001/confthr_pvrcnn/split_2.py"

frac = "020"
frac_path = "0.2"
