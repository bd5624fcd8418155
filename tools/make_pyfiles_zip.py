"""Build the --py-files archive for spark-submit deployment.

    python tools/make_pyfiles_zip.py [dist/bigmatch_utilities_spark.zip]
    spark-submit --py-files dist/bigmatch_utilities_spark.zip \
        jobs/run_match.py --input ... --output ...

The zip contains the package at top level so executors can import
``bigmatch_utilities_spark`` directly.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bigmatch_utilities_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", f"{PKG}.zip"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
