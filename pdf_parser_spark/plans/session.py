"""SparkSession factory tuned for the extraction workload (SURVEY §4).

Scale rationale (targets a 1000-executor cluster; local[N] here):
  - AQE on: runtime coalescing + skew-join splitting absorb the
    document-size skew the corpus is built with (mega-docs, hot hosts).
  - Arrow batches capped so a batch of page-text blobs fits executor
    memory (html/text rows are KB-MB scale, unlike typical columns).
  - shuffle.partitions sized for local test runs; production submit
    overrides via spark-submit --conf (jobs/extract.py documents the
    cluster profile).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession

# At 100 TB / ~128 MB splits there are ~800k scan tasks; shuffle
# partitions should track cluster cores × 2-3, set at submit time.
# Locally: cores × 2 keeps all 32 threads busy without tiny-task spam.
_LOCAL_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # page text rows are large; keep Arrow batches small enough that
    # batch_size × avg_row_bytes stays well under worker memory
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "pdf-parser-spark", cpus: int | None = None) -> SparkSession:
    """local[N] session with the engine's tuned defaults.

    N comes from (in order): explicit arg, $SPARK_GRAFT_CPUS, all cores.
    """
    n = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = SparkSession.builder.appName(app_name).master(f"local[{n}]")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if shuffle is None:
        cores = os.cpu_count() or 8 if n == "*" else int(n)
        shuffle = str(max(8, cores * 2))
    builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    for key, value in _LOCAL_DEFAULTS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Distribute this package to executors (local or cluster).

    Python workers don't inherit the driver's sys.path mutations, so a
    job launched from outside the repo root fails with
    ModuleNotFoundError inside pandas UDFs. Zipping the package and
    addPyFile-ing it is the same mechanism `spark-submit --py-files`
    uses and works identically on a real cluster.
    """
    import hashlib

    pkg_dir = pathlib.Path(__file__).resolve().parent.parent
    if not pkg_dir.is_dir():
        # Imported from a zip already (spark-submit --py-files puts the
        # archive itself on the driver's path): rglob over a zip member
        # path yields nothing, so re-ship the containing archive verbatim
        # instead of building an empty one.
        s = str(pkg_dir)
        idx = s.lower().rfind(".zip")
        if idx != -1:
            spark.sparkContext.addPyFile(s[: idx + 4])
        return
    files = sorted(pkg_dir.rglob("*.py"))
    # cache key = content fingerprint, NOT pid: a recycled pid (or a
    # prior round's process) must never ship a stale zip of old code
    fp = hashlib.sha1()
    for py in files:
        st = py.stat()
        fp.update(f"{py.relative_to(pkg_dir)}:{st.st_size}:{st.st_mtime_ns};".encode())
    zip_path = (
        pathlib.Path(tempfile.gettempdir()) / f"pdf_parser_spark_{fp.hexdigest()[:16]}.zip"
    )
    if not zip_path.exists():
        tmp = zip_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in files:
                zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
        tmp.replace(zip_path)
    spark.sparkContext.addPyFile(str(zip_path))
