"""Build the --py-files archive for cluster deployment.

north_rule: the pipeline is "driven end-to-end by spark-submit
--py-files on multi-executor clusters".  This tool produces that
archive:

    python tools/make_pyfiles_zip.py /tmp/serimi_spark.zip
    spark-submit --master yarn --py-files /tmp/serimi_spark.zip \
        tools/spark_submit_main.py -s ... -t ... -c ... -o ...

The zip contains the `serimi_rdf_interlinking_spark` package only (no
tests, no __pycache__, no repo metadata) so executors and the driver
import the same code regardless of the working directory.  Zip entries
are written in sorted order with a fixed timestamp so the archive is
byte-deterministic for a given tree (same property the alignment sink
relies on for idempotent re-submission).
"""

from __future__ import annotations

import os
import sys
import zipfile

PACKAGE = "serimi_rdf_interlinking_spark"
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # deterministic archive bytes


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PACKAGE)
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, root)
            entries.append((full, arc))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serimi_spark.zip"
    print(build_zip(out))
