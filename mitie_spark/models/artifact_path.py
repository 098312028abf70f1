"""Model-artifact path resolution for both launch modes.

Local dev imports ``mitie_spark`` from a real directory, so
``os.path.join(os.path.dirname(__file__), "artifacts", name)`` is a real
file. The documented cluster launch (`spark-submit --py-files
mitie_spark.zip --files *.npz`, plans/pipeline.py docstring) zipimports
the package: ``__file__``-relative paths point INSIDE the zip where
``np.load`` cannot open them, and ``--files`` artifacts land in each
task's working directory instead. Every loader therefore resolves paths
through this chain:

1. the path as given, if it exists (local dev, explicit user paths);
2. ``SparkFiles.get(basename)`` (artifacts shipped via ``--files``);
3. the basename in the current working directory (YARN/K8s localize
   ``--files`` there even before a SparkContext exists in the worker);
4. the packaged resource read through the package loader (works inside
   a zip) and materialized once to a content-addressed temp file — so
   ``--py-files mitie_spark.zip`` alone is a complete deployment.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

_PKG = "mitie_spark.models"


def resolve_artifact(path: str) -> str:
    """→ a real filesystem path for ``path`` (see module docstring)."""
    if os.path.exists(path):
        return path
    base = os.path.basename(path)
    try:
        from pyspark import SparkFiles

        cand = SparkFiles.get(base)
        if os.path.exists(cand):
            return cand
    except Exception:
        pass
    if os.path.exists(base):
        return os.path.abspath(base)
    try:
        import importlib.resources as ir

        data = (ir.files(_PKG) / "artifacts" / base).read_bytes()
    except Exception:
        raise FileNotFoundError(
            f"model artifact {path!r} not found on disk, via SparkFiles, "
            "in the working directory, or inside the mitie_spark package"
        ) from None
    out = os.path.join(
        tempfile.gettempdir(),
        f"mitie_spark_artifact_{hashlib.md5(data).hexdigest()[:16]}_{base}",
    )
    if not os.path.exists(out):
        tmp = f"{out}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, out)  # atomic: concurrent workers race safely
    return out
