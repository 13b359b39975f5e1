"""Dual console/file logger factory (reference src/logger.py:1-66 parity).

Spark-first differences from the reference's single-process factory:

  - the FILE handler attaches only on the DRIVER. Executors run the
    same modules, but hundreds of Python workers appending to one
    shared file is a corruption hazard and a non-local-filesystem
    assumption; executor-side records go to stderr, which Spark's own
    executor-log collection already aggregates per container.
  - idempotent per logger name (re-invocation never duplicates
    handlers), and `propagate` is disabled so records don't double
    through the root logger Spark configures.

Same observable surface as the reference: console at INFO, file at
DEBUG, identical format/datefmt, `get_logger(__name__)` call shape.
"""

from __future__ import annotations

import logging
from pathlib import Path

FMT = "%(asctime)s [%(levelname)s] %(name)s - %(message)s"
DATEFMT = "%Y-%m-%d %H:%M:%S"


def _on_executor() -> bool:
    """True inside a Spark task (Python worker), False on the driver
    or in a plain process."""
    try:
        from pyspark import TaskContext

        return TaskContext.get() is not None
    except ImportError:
        return False


def get_logger(
    name: str,
    log_dir: str = "logs",
    log_file: str = "pdf_parser_spark.log",
    console_level: int = logging.INFO,
    file_level: int = logging.DEBUG,
) -> logging.Logger:
    """Create or retrieve a configured dual-handler logger."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    if not logger.handlers:
        formatter = logging.Formatter(FMT, datefmt=DATEFMT)

        console = logging.StreamHandler()
        console.setLevel(console_level)
        console.setFormatter(formatter)
        logger.addHandler(console)

        if not _on_executor():
            path = Path(log_dir)
            path.mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(path / log_file, encoding="utf-8")
            fh.setLevel(file_level)
            fh.setFormatter(formatter)
            logger.addHandler(fh)

    return logger
