#!/usr/bin/env python
"""Print a fully-resolved config (reference ``tools/misc/print_config.py``)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    args = ap.parse_args()
    from detmatch_tpu.config import Config
    print(Config.fromfile(args.config).dump())


if __name__ == "__main__":
    main()
