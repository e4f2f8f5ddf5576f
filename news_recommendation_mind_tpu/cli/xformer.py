"""XFormer (one-tower) entry point (counterpart of reference xformer.py).

Usage:
    python -m news_recommendation_mind_tpu.cli.xformer \
        -s synthetic -m train --bert longformer
"""
from __future__ import annotations

import sys
from typing import Optional, Sequence

from ..config import parse_config
from .common import run


def main(argv: Optional[Sequence[str]] = None):
    cfg = parse_config(argv, model="xformer")
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
