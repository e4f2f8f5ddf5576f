"""PLM entry point (counterpart of reference plm.py).

Usage:
    python -m news_recommendation_mind_tpu.cli.plm \
        -s synthetic -m train --bert newsbert --encoderU attn
"""
from __future__ import annotations

import sys
from typing import Optional, Sequence

from ..config import parse_config
from .common import run


def main(argv: Optional[Sequence[str]] = None):
    cfg = parse_config(argv, model="plm")
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
