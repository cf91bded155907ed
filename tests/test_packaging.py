"""spark-submit --py-files packaging contract (north rule).

On a real cluster the pipeline ships as `spark-submit --py-files
kmcp_spark.zip` (README "Cluster deployment"): executors import the
package from the zip on sys.path.  These tests prove the package is
zip-safe — importable from a zip archive alone, with no reliance on
repo-relative files, __file__-based data loading, or import-time side
effects that need a real filesystem tree.
"""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(tmp_path) -> str:
    zpath = str(tmp_path / "kmcp_spark.zip")
    pkg = os.path.join(REPO, "kmcp_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_package_imports_from_zip_alone(tmp_path):
    """Fresh interpreter, zip as the ONLY path to the package (cwd moved
    elsewhere): every module must import and a kernel must run."""
    zpath = _build_zip(tmp_path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import kmcp_spark\n"
        "assert 'kmcp_spark.zip' in kmcp_spark.__file__, kmcp_spark.__file__\n"
        "import importlib, pkgutil\n"
        "mods = [m.name for m in pkgutil.walk_packages(kmcp_spark.__path__, 'kmcp_spark.')]\n"
        "for m in mods: importlib.import_module(m)\n"
        "from kmcp_spark.functions.hashing import splitmix64\n"
        "import numpy as np\n"
        "assert splitmix64(np.array([1], dtype=np.uint64))[0] != 1\n"
        "from kmcp_spark.config import PipelineConfig\n"
        "assert PipelineConfig().fingerprint()\n"
        "print('OK', len(mods))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.startswith("OK")


def test_no_import_time_spark_session():
    """Importing the package must not create a SparkSession (executors
    import it as a library; only the driver owns the session)."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import importlib, pkgutil, kmcp_spark\n"
        "for m in pkgutil.walk_packages(kmcp_spark.__path__, 'kmcp_spark.'):\n"
        "    importlib.import_module(m.name)\n"
        "from pyspark.sql import SparkSession\n"
        "assert SparkSession.getActiveSession() is None\n"
        "print('OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, REPO],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
