"""``python -m statecatcher_tpu`` → the training CLI (see cli.py)."""

from statecatcher_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
