"""Real `spark-submit --py-files` deployment path (north_rule clause).

The other CLI tests call main() in-process; this one proves the
documented cluster deployment actually works: the package is shipped
ONLY as the --py-files zip (cwd is a scratch dir, PYTHONPATH cleared),
a version-matched spark-submit launches a fresh driver JVM, and the
alignment output lands on disk. On a real cluster only --master
changes (get_spark defers to the submitted master when running under
spark-submit — see session.py).
"""

import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from serimi_rdf_interlinking_spark.sources.fixtures import (  # noqa: E402
    CLASS_CITY,
    build_interlinking_fixture,
)
from tools.make_pyfiles_zip import build_zip  # noqa: E402

TRIPLE_COLS = ["s", "p", "o", "o_is_uri", "is_bnode"]


def _spark_submit() -> str | None:
    # Prefer the distro that version-matches the installed pyspark.
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.access(cand, os.X_OK):
        return cand
    return shutil.which("spark-submit")


def _write_triples(rows, path: str) -> None:
    cols = list(zip(*rows))
    table = pa.table(
        {
            "s": pa.array(cols[0], pa.string()),
            "p": pa.array(cols[1], pa.string()),
            "o": pa.array(cols[2], pa.string()),
            "o_is_uri": pa.array(cols[3], pa.bool_()),
            "is_bnode": pa.array(cols[4], pa.bool_()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-0.parquet"))


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this host")

    fx = build_interlinking_fixture(n_entities=40, seed=7)
    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    out_dir = str(tmp_path / "out")
    _write_triples(fx.source, src_dir)
    _write_triples(fx.target, tgt_dir)

    zip_path = build_zip(str(tmp_path / "serimi_spark.zip"), repo_root=REPO)
    launcher = str(tmp_path / "launch.py")
    shutil.copyfile(os.path.join(REPO, "tools", "spark_submit_main.py"), launcher)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        launcher,
        "-s", src_dir, "-t", tgt_dir, "-c", CLASS_CITY, "-o", out_dir,
        "-k", "10", "-p", "1", "--shuffle-partitions", "4",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"

    lines = []
    for fn in os.listdir(out_dir):
        if fn.startswith("part-") and not fn.endswith(".crc"):
            with open(os.path.join(out_dir, fn)) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) > 10
    assert all("=" in ln for ln in lines)
