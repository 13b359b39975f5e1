"""Cold-process `spark-submit --py-files` launch of the extraction job.

North-rule operational contract: the job "is launched via spark-submit
--py-files on multi-executor clusters". docs/RUNBOOK.md documents that
profile; this test EXECUTES it end-to-end with the real distribution's
bin/spark-submit in a scratch directory:

  - the package ships ONLY as pdf_parser_spark.zip (built with the
    RUNBOOK's exact loop) — the test copies jobs/extract.py out of the
    repo and strips PYTHONPATH, so every `pdf_parser_spark` import on
    the driver AND inside executor python workers must resolve from
    the shipped archive, exactly as on a 1000-executor cluster;
  - the job's resume contract is exercised through the same cold
    entry point (second submit: 0 newly extracted, pure anti-join).

Reference parity: the reference is launched as `python run.py <pdf>`
per document (/root/reference/README.md); this is the distributed
equivalent launch surface.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="no spark-submit on PATH (pip-only install)"
)


def _build_pyfiles_zip(dest: pathlib.Path) -> pathlib.Path:
    """The RUNBOOK's packaging loop, verbatim semantics."""
    zip_path = dest / "pdf_parser_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted((REPO / "pdf_parser_spark").rglob("*.py")):
            zf.write(p, arcname=str(p.relative_to(REPO)))
    return zip_path


def _submit(job: pathlib.Path, zip_path: pathlib.Path, cwd: pathlib.Path, *args: str):
    env = {
        k: v
        for k, v in os.environ.items()
        # a clean launch environment: the repo must not leak onto the
        # driver's import path except through --py-files
        if k not in ("PYTHONPATH", "PYSPARK_SUBMIT_ARGS")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", str(zip_path),
        str(job),
        *args,
    ]
    return subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )


def _summary(proc: subprocess.CompletedProcess) -> dict:
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON summary in stdout:\n{proc.stdout[-2000:]}")


def test_spark_submit_pyfiles_extract_and_resume(spark, tmp_path):
    from pdf_parser_spark.sources.corpus import synthetic_documents, write_documents

    docs = tmp_path / "docs.parquet"
    write_documents(synthetic_documents(spark, 30, seed=42), str(docs))

    # the job script leaves the repo: its parent-dir sys.path insert
    # then points at tmp_path, so the zip is the only package source
    job = tmp_path / "extract_job.py"
    shutil.copy(REPO / "jobs" / "extract.py", job)
    zip_path = _build_pyfiles_zip(tmp_path)
    outdir = tmp_path / "jobout"

    s1 = _summary(
        _submit(job, zip_path, tmp_path, "--input", str(docs), "--outdir", str(outdir))
    )
    assert s1["newly_extracted"] == 30
    # golden statuses at seed 42 / 30 docs (see .claude/skills/verify)
    assert s1["status_counts"].get("ok") == 23
    assert (outdir / "extracted").exists()

    s2 = _summary(
        _submit(
            job, zip_path, tmp_path,
            "--input", str(docs), "--outdir", str(outdir), "--resume",
        )
    )
    assert s2["already_extracted"] == 30
    assert s2["newly_extracted"] == 0
