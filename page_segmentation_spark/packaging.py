"""Executor-side packaging: ship this package to Python workers.

The reference parallelizes decode with a local ``multiprocessing.Pool``
(lib/dataset.py:195) where workers inherit the parent's modules.  Spark
executors don't — the package must travel.  Production path:

    spark-submit --py-files $(python -m page_segmentation_spark.packaging)

which prints a freshly-built zip.  Programmatic path: :func:`ship_package`
(called by :func:`page_segmentation_spark.session.get_spark`) builds the
same zip and registers it with ``sc.addPyFile`` so any cluster manager
distributes it.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Deterministically zip the package (source only) for --py-files."""
    out_path = out_path or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"{_PKG_NAME}.zip"
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(_PKG_DIR):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    _PKG_NAME, os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return out_path


def ship_package(spark) -> str:
    """Build the zip and distribute it to executors (idempotent).

    When the package itself was imported FROM a ``--py-files`` zip
    (spark-submit production path), ``_PKG_DIR`` is a path inside that
    zip: it is not a walkable directory, and rebuilding would clobber
    the already-registered archive with an empty one (addFile then
    rejects the content mismatch).  The package is already on every
    executor in that case, so shipping is a no-op."""
    if not os.path.isdir(_PKG_DIR):
        return _PKG_DIR
    path = make_pyfiles_zip()
    spark.sparkContext.addPyFile(path)
    return path


if __name__ == "__main__":
    print(make_pyfiles_zip())
