_base_ = "split_0.py"

split = 2
