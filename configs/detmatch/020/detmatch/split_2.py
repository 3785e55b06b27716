_base_ = "../../001/detmatch/split_2.py"

frac = "020"
frac_path = "0.2"
