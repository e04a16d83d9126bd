"""spark-submit --py-files packaging — the north rule's ship path.

Zips the package, launches a REAL spark-submit subprocess with the zip on
--py-files (cwd outside the repo so imports resolve from the zip alone),
and checks the job output.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path):
    pkg_zip = tmp_path / "wkg.zip"
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "web3_knowledge_graph_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    cli = os.path.join(REPO, "web3_knowledge_graph_spark", "cli.py")
    out = tmp_path / "mentions_out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--driver-memory", "4g",
            "--py-files", str(pkg_zip),
            cli,
            "--job", "mentions",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-sufficient
        env=env,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    payload = [l for l in res.stdout.splitlines() if l.startswith("{")]
    assert payload, res.stdout[-2000:]
    info = json.loads(payload[-1])
    assert info["job"] == "mentions" and info["rows"] > 0
    assert os.path.isdir(out)