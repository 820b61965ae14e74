"""The north rule's literal deployment shape: spark-submit --py-files
onto a multi-executor (local-cluster) master, package shipped as a zip,
tiles written by executor JVMs that never saw the repo's sys.path."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_multi_executor(tmp_path):
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from make_pyfiles_zip import make_zip

    zip_path = make_zip(str(tmp_path / "pkg.zip"))
    out_dir = tmp_path / "tiles"
    out_dir.mkdir()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    r = subprocess.run(
        [_SUBMIT, "--master", "local-cluster[2,2,2048]",
         "--py-files", zip_path,
         os.path.join(_REPO, "tools", "submit_render.py"),
         "24", str(out_dir), "2", "5"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))  # cwd outside the repo: no implicit imports
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["executors"].startswith("local-cluster")
    assert stats["zooms"] and all(v["tiles"] > 0 for v in stats["zooms"].values())
    pngs = glob.glob(str(out_dir / "*" / "*" / "*.png"))
    assert pngs, "no tiles written by the submitted job"
    zooms = {int(p.split(os.sep)[-3]) for p in pngs}
    assert zooms <= set(range(2, 6)) and zooms
