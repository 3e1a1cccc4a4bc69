"""CLI entry point (SURVEY.md R1/R2, reference `main.py`).

Examples:
  python main.py --config nyu_completion_500 --workdir /tmp/run1
  python main.py --config nyu_completion_500 --evaluate --workdir /tmp/run1
  python main.py --config synthetic_tiny --set train.epochs=2
  python main.py --list-configs

Every reference flag maps onto a named config + dotted overrides, e.g.
`--data nyudepthv2 --modality rgbd -s 500` becomes
`--config nyu_completion_500 --set data.num_samples=500
 --set model.modality=rgbd`.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--config", default="nyu_completion_500",
                   help="named config (see --list-configs)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="dotted config override, e.g. train.lr=0.005")
    p.add_argument("--workdir", default=None,
                   help="checkpoint/log dir (default: config's)")
    p.add_argument("--evaluate", action="store_true",
                   help="evaluate the latest/best checkpoint and exit")
    p.add_argument("--resume", action="store_true", default=True,
                   help="resume from latest checkpoint if present (default)")
    p.add_argument("--list-configs", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before anything")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from cspn_monodepth_tpu.configs import CONFIGS, get_config

    if args.list_configs:
        for name, cfg in CONFIGS.items():
            print(f"{name}: dataset={cfg.data.dataset} "
                  f"{cfg.data.height}x{cfg.data.width} "
                  f"iters={cfg.model.num_iters} batch={cfg.train.batch_size} "
                  f"mesh={cfg.mesh.data}x{cfg.mesh.spatial}")
        return 0

    if args.multihost:
        import jax

        jax.distributed.initialize()

    cfg = get_config(args.config)
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = v
    if overrides:
        cfg = cfg.override(**overrides)

    from cspn_monodepth_tpu.train.loop import Trainer

    trainer = Trainer(cfg, workdir=args.workdir)

    if args.evaluate:
        from cspn_monodepth_tpu.train.checkpoint import (
            CheckpointManager, abstract_state_of)

        state = trainer.init_state()
        ckpt = CheckpointManager(trainer.workdir)
        step = ckpt.best_step() or ckpt.latest_step()
        restored, _ = ckpt.restore(abstract_state_of(state), step=step)
        if restored is not None:
            state = restored
            print(f"evaluating checkpoint step {step}")
        else:
            print("no checkpoint found; evaluating fresh init")
        trainer.evaluate(state)
        return 0

    trainer.fit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
