#!/usr/bin/env python
"""Evaluation CLI (parity: reference `tools/test.py` — `--eval bbox`,
`--format-only`)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test a 3D detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", nargs="*", default=["bbox"])
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--out", default=None, help="metrics json output path")
    p.add_argument("--jsonfile-prefix", default="results")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="key=value overrides with dotted keys")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if os.environ.get("ISFUSION_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISFUSION_PLATFORM"])
    from isfusion_tpu.config import Config
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.datasets import build_dataset, build_dataloader
    from isfusion_tpu.apis.test import single_device_test
    from isfusion_tpu.parallel.train_step import TrainState

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        import ast
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            opts[k] = v
        cfg.merge_from_dict(opts)
    model = build_detector(dict(cfg.model))
    dataset = build_dataset(cfg.data["test" if "test" in cfg.data
                                     else "val"])
    from isfusion_tpu.ops.host_plan import make_plan_fn
    loader = build_dataloader(
        dataset, samples_per_gpu=int(cfg.data.get("samples_per_gpu", 1)),
        shuffle=False, drop_last=False,
        plan_fn=make_plan_fn(dict(cfg.model), train=False))

    import optax
    if args.checkpoint:
        from isfusion_tpu.runner.checkpoint import load_params
        variables, _ = load_params(args.checkpoint)
    else:
        batch0 = next(iter(loader))
        arrays0 = {k: v for k, v in batch0.items() if k != "img_metas"}
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False, mode="feats"))(
                jax.random.PRNGKey(0), arrays0)
    state = TrainState.create(dict(variables), optax.identity())

    results = single_device_test(model, state, loader)
    if args.format_only:
        path, _ = dataset.format_results(results, args.jsonfile_prefix)
        print(f"wrote {path}")
        return
    metrics = dataset.evaluate(results,
                               jsonfile_prefix=args.jsonfile_prefix)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
