"""Shared fixtures: reference-module loader + (lazy) Spark session.

The reference at /root/reference is importable pure Python (pydantic is
installed); `rich` is absent in this container so a no-op stand-in is
registered before importing src.validate / src.run. This shim is
test-side scaffolding only — the engine itself never imports the
reference.
"""

from __future__ import annotations

import sys
import types

import pytest

REFERENCE_ROOT = "/root/reference"


def _install_rich_stub() -> None:
    if "rich" in sys.modules:
        return

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):
            return lambda *a, **k: None

    rich = types.ModuleType("rich")
    console = types.ModuleType("rich.console")
    table = types.ModuleType("rich.table")
    console.Console = _Noop
    table.Table = _Noop
    sys.modules.update({"rich": rich, "rich.console": console, "rich.table": table})


@pytest.fixture(scope="session")
def ref():
    """Namespace of reference modules (utils, toc, chunk, validate)."""
    _install_rich_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import logging

    logging.disable(logging.CRITICAL)
    from src import chunk as ref_chunk
    from src import toc as ref_toc
    from src import utils as ref_utils
    from src import validate as ref_validate

    ns = types.SimpleNamespace(
        utils=ref_utils, toc=ref_toc, chunk=ref_chunk, validate=ref_validate
    )
    return ns


@pytest.fixture(scope="session")
def spark():
    from pdf_parser_spark.plans.session import get_spark

    s = get_spark(app_name="pdf-parser-spark-tests")
    yield s
    s.stop()
