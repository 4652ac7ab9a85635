"""Ship this package to executors so UDF closures resolve everywhere.

Cloudpickle serializes module-level functions *by reference* (module +
qualname), so any Pandas UDF / ``mapInPandas`` closure that touches a
helper defined in this package requires the Python worker processes to
be able to ``import export_oltp_to_olap_spark``.  That holds when the
driver runs from the repo root (workers inherit the cwd on
``sys.path``) but breaks the moment a driver imports us from elsewhere.

On a real cluster the fix is ``spark-submit --py-files engine.zip`` —
the package travels with the job.  :func:`ensure_shipped` is the
programmatic equivalent: zip the package once per process and
``sc.addPyFile`` it, which distributes the archive to every executor
and prepends it to each worker's ``sys.path``.  Idempotent per
application; the zip is a few hundred KB, built once, cached in the
process temp dir.
"""

from __future__ import annotations

import pathlib
import shutil
import tempfile
import threading

from pyspark.sql import SparkSession

_lock = threading.Lock()
_zip_path: str | None = None
_shipped_apps: set[str] = set()


def _build_zip() -> str:
    """Zip the installed package directory (once per process)."""
    global _zip_path
    if _zip_path is None:
        pkg_dir = pathlib.Path(__file__).resolve().parent
        staging = tempfile.mkdtemp(prefix="spark_engine_pyfiles_")
        _zip_path = shutil.make_archive(
            str(pathlib.Path(staging) / pkg_dir.name),
            "zip",
            root_dir=str(pkg_dir.parent),
            base_dir=pkg_dir.name,
        )
    return _zip_path


def ensure_shipped(spark: SparkSession) -> None:
    """Make this package importable on every executor (idempotent)."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    with _lock:
        if app_id in _shipped_apps:
            return
        sc.addPyFile(_build_zip())
        _shipped_apps.add(app_id)
