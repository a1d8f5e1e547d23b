"""North-rule launch mode: `spark-submit --py-files <pkg.zip>` end-to-end.

The CLI tests drive `python -m infoscience_imports_spark.cli` (same code
path); this one exercises the literal deployment shape the north rule
names — the package shipped as a zip via --py-files to spark-submit, with
NOTHING importable from the working directory — proving the engine runs
from the artifact a cluster would distribute to executors.
"""

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

from infoscience_imports_spark.sources.synthetic import generate_web_pages, pipeline_input

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def _build_pkg_zip(dest_dir: str) -> str:
    pkg_root = os.path.join(REPO, "infoscience_imports_spark")
    zip_path = os.path.join(dest_dir, "infoscience_imports_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zip_path


def test_spark_submit_py_files_runs_pipeline(spark, tiny_pages):
    work = tempfile.mkdtemp(prefix="submit-")
    in_dir = os.path.join(work, "pages")
    wh = os.path.join(work, "wh")
    pipeline_input(tiny_pages).write.mode("overwrite").parquet(in_dir)
    zip_path = _build_pkg_zip(work)
    # a driver script that imports ONLY from the shipped zip
    driver = os.path.join(work, "driver.py")
    with open(driver, "w") as f:
        f.write(
            "import sys\n"
            "from infoscience_imports_spark.cli import main\n"
            "sys.exit(main())\n"
        )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            driver,
            "run", "--input", in_dir, "--warehouse", wh,
            "--stage", "all", "--cores", "4", "--shuffle-partitions", "8",
        ],
        capture_output=True,
        text=True,
        cwd=work,  # NOT the repo: the zip must be the only import source
        env=env,
        timeout=500,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    payload = json.loads(
        [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert payload["rows"]["components"] == 200
    assert set(payload["fingerprints"]) == {
        "extract", "signatures", "buckets", "edges", "components",
    }
    shutil.rmtree(work)
