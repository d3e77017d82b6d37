"""CLI entry: ``python -m statecatcher_tpu.cli [--config file.json] [--a.b v]``.

The reference's argparse surface (reference train.py:606-676) maps onto
dotted config overrides, e.g.::

    python -m statecatcher_tpu.cli \
        --model.encoder lucyrnn --train.mode ctc \
        --data.source local --data.local_dir fixtures/ \
        --data.target-duration 8.0 --train.steps 1000
"""

from __future__ import annotations

import sys

from statecatcher_tpu.config import Config


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = Config()
    if "--config" in argv:
        i = argv.index("--config")
        path = argv[i + 1]
        del argv[i:i + 2]
        with open(path) as f:
            cfg = Config.from_json(f.read())
    cfg = cfg.apply_overrides(argv)

    from statecatcher_tpu.train.loop import train

    summary = train(cfg)
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
