"""Result logging: performance.log append + optional email notification.

Counterpart of the reference's _log (reference utils/Manager.py:346-374):
results append to performance.log with the experiment name and hyperparams;
email delivery (the reference's Gmail SMTP with the AUC in the subject,
README.md:13-16) is attempted only when an address and SMTP environment are
configured, and failures are swallowed exactly like the reference.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

_FMT = "[%(levelname)s] %(asctime)s %(name)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


# one id per process: interleaved runs appending to the shared
# performance.log stay attributable, and out-of-order step numbers are
# explained by their run column (round-1 ADVICE findings)
_RUN_ID: Optional[str] = None
_LAST_KEY: Optional[tuple] = None


def _run_id() -> str:
    global _RUN_ID
    if _RUN_ID is None:
        import time
        _RUN_ID = f"{time.strftime('%Y%m%dT%H%M%S')}.{os.getpid()}"
    return _RUN_ID


def log_result(name: str, scale: str, step: int, metrics: Dict[str, float],
               hyper: Optional[Dict] = None,
               log_path: str = "performance.log",
               email: Optional[str] = None) -> None:
    global _LAST_KEY
    key = (name, scale, step, tuple(sorted(metrics.items())))
    if key == _LAST_KEY:
        return  # drop immediate duplicates (e.g. final eval re-logging
    _LAST_KEY = key  # the last periodic eval's identical metrics)
    line = (f"run={_run_id()}\t{name}\tscale={scale}\tstep={step}\t"
            + "\t".join(f"{k}={v}" for k, v in metrics.items()))
    if hyper:
        line += "\t" + " ".join(f"{k}={v}" for k, v in hyper.items())
    with open(log_path, "a", encoding="utf-8") as f:
        f.write(line + "\n")
    if email:
        try:
            _send_email(email, name, metrics)
        except Exception:
            pass  # result delivery must never fail the run


def _send_email(addr: str, name: str, metrics: Dict[str, float]) -> None:
    import smtplib
    from email.mime.text import MIMEText
    host = os.environ.get("SMTP_HOST")
    if not host:
        return
    msg = MIMEText("\n".join(f"{k}: {v}" for k, v in metrics.items()))
    msg["Subject"] = f"[{name}] auc={metrics.get('auc', 'n/a')}"
    msg["To"] = addr
    msg["From"] = os.environ.get("SMTP_FROM", addr)
    with smtplib.SMTP(host) as s:
        s.send_message(msg)
