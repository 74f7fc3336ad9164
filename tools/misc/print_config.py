#!/usr/bin/env python
"""Dump a resolved config (parity: reference `tools/misc/print_config.py`)."""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from isfusion_tpu.config import Config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    pprint.pprint({k: cfg[k] for k in cfg.keys()}, width=100)


if __name__ == "__main__":
    main()
