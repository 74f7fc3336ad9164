#!/usr/bin/env python
"""Strip optimizer state from a checkpoint for release (parity: reference
`tools/model_converters/publish_model.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_dir", help="orbax checkpoint work_dir")
    p.add_argument("out_dir")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    from isfusion_tpu.runner.checkpoint import load_params, save_checkpoint
    variables, meta = load_params(args.in_dir, step=args.step)
    save_checkpoint(args.out_dir, variables, step=meta.get("epoch", 0),
                    meta=dict(meta, published=True))
    print(f"published params-only checkpoint to {args.out_dir}")


if __name__ == "__main__":
    main()
