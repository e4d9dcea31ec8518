"""Build the --py-files artifact: sparklog.zip with the package at root.

    python jobs/package.py [out_dir]
    spark-submit --py-files sparklog.zip jobs/run_pipeline.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_dir: str = ".") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(out_dir, "sparklog.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "sparklog")
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "."))
