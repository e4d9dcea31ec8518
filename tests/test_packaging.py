"""spark-submit --py-files packaging: the zip must be importable on its own."""

from __future__ import annotations

import subprocess
import sys


def test_zip_importable_standalone(tmp_path):
    from jobs.package import build

    zip_path = build(str(tmp_path))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import sparklog.parse, sparklog.pipeline, sparklog.checkpoint; "
        "r = sparklog.parse.parse_message('<1>1 - - - - - -'); "
        "assert r['severity'] == 1 and r['facility'] == 0, r; print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"
