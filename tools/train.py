#!/usr/bin/env python
"""Training CLI (parity: reference `tools/train.py`)."""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a 3D detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--no-dist", action="store_true",
                   help="single-device even with multiple chips")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="key=value overrides with dotted keys")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of steps 3-8 to DIR")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    # the sitecustomize-pinned axon platform ignores JAX_PLATFORMS env;
    # honor ISFUSION_PLATFORM through jax.config (must precede backend use)
    if os.environ.get("ISFUSION_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["ISFUSION_PLATFORM"])
    from isfusion_tpu.config import Config
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.datasets import build_dataset
    from isfusion_tpu.apis import set_random_seed, train_model

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            try:
                import ast
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            opts[k] = v
        cfg.merge_from_dict(opts)
    cfg.seed = args.seed
    if args.profile:
        cfg.profile_dir = args.profile
    set_random_seed(args.seed, deterministic=args.deterministic)

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    model = build_detector(dict(cfg.model))
    dataset = build_dataset(cfg.data["train"])
    train_model(model, dataset, cfg, work_dir=work_dir,
                resume_from=args.resume_from,
                distributed=not args.no_dist)


if __name__ == "__main__":
    main()
