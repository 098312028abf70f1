"""Launch-mode contract (north rule: "run via spark-submit --py-files").

`spark-submit --py-files mitie_spark.zip` must be a COMPLETE deployment:
the package zipimports, and model loaders fall back through
``mitie_spark.models.artifact_path.resolve_artifact`` (real path →
SparkFiles → task CWD → packaged resource materialized from the zip) —
``__file__``-relative artifact paths do not exist inside a zip.
"""

import os
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_artifact_chain():
    from mitie_spark.models.artifact_path import resolve_artifact

    # 1) existing paths pass through untouched
    real = os.path.join(REPO, "mitie_spark", "models", "artifacts", "langid.npz")
    assert resolve_artifact(real) == real
    # 2) a dead directory falls through to the packaged resource, which
    #    materializes to a loadable file
    p = resolve_artifact("/nonexistent/dir/langid.npz")
    z = np.load(p, allow_pickle=False)
    assert "log_w" in z
    # 3) unknown artifacts raise FileNotFoundError (not a silent miss)
    try:
        resolve_artifact("/nonexistent/dir/zz_not_an_artifact.npz")
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_spark_submit_pyfiles_zip_runs_pipeline():
    """Real `spark-submit --py-files mitie_spark.zip` from a temp dir (no
    checkout on sys.path): the driver asserts the package zipimported and
    the full pipeline runs — worker-side model loads exercise the
    packaged-resource branch of resolve_artifact."""
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "spark_submit_smoke.sh")],
        env={**os.environ, "SMOKE_PAGES": "60"},
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "PACKAGE_FROM_ZIP:" in out.stdout and "mitie_spark.zip" in out.stdout
    assert '"pages": 60' in out.stdout and '"triples"' in out.stdout
