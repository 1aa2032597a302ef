"""Run logger — parity with the reference's ``logger.py``: a timestamped
per-run log file (``{name}_{YYYY_MM_DD_HH_MM_SS}_.log``) capturing DEBUG+
to the file and INFO+ to the console, via the stdlib ``logging`` module
(reference logger.py:1-60). Driver-side only: executor-side diagnostics
flow through the fetch log's status/error columns and the snapshot
manifests, which is where a distributed engine's per-row story belongs.
"""

from __future__ import annotations

import logging
import os
from time import gmtime, strftime


def get_run_logger(name: str, logging_dir: str = "LOGGING") -> logging.Logger:
    """Create (or return) the per-run file+console logger."""
    logger = logging.getLogger(name)
    if logger.handlers:  # already configured for this run
        return logger
    os.makedirs(logging_dir, exist_ok=True)
    timestamp = strftime("%Y_%m_%d_%H_%M_%S", gmtime())
    path = os.path.join(logging_dir, f"{name}_{timestamp}_.log")
    logger.setLevel(logging.DEBUG)
    fh = logging.FileHandler(path, mode="a")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(
        logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
            datefmt="%m-%d-%Y %H:%M",
        )
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(name)s - %(levelname)s - %(message)s"))
    logger.addHandler(fh)
    logger.addHandler(console)
    logger.propagate = False
    logger.info("Saving log to %s", path)
    return logger
