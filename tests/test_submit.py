"""North-rule shipping surface: the pipeline runs via
``spark-submit --py-files hayoo_spark.zip`` (fresh JVM, package shipped
as a zip, no repo-root sys.path) and produces an index the serving
engine opens."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "hayoo_spark.zip")
    pkg = os.path.join(REPO, "hayoo_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_build(spark, tmp_path):
    from hayoo_spark import fixtures
    from hayoo_spark.query.engine import SearchEngine

    fixtures.write_pages(str(tmp_path / "pages"), 300)
    ix = str(tmp_path / "ix")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--py-files", _zip_package(tmp_path),
         os.path.join(REPO, "scripts", "build_index.py"),
         "--pages", str(tmp_path / "pages" / "pages.parquet"),
         "--index", ix, "--segments", "4", "--cores", "2"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))  # cwd outside the repo: no implicit sys.path
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.exists(os.path.join(ix, "manifest"))
    hits = SearchEngine(spark, ix).search("baba", k=5)
    assert hits and all(score > 0 for _url, score in hits)
