"""Two-tower entry point (counterpart of reference twotower.py).

Usage:
    python -m news_recommendation_mind_tpu.cli.twotower \
        -s synthetic -m train --encoderN cnn --encoderU lstm -e 2
"""
from __future__ import annotations

import sys
from typing import Optional, Sequence

from ..config import parse_config
from .common import run


def main(argv: Optional[Sequence[str]] = None):
    cfg = parse_config(argv, model="twotower")
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
