#!/usr/bin/env python
"""Package pii_core + pii_spark into dist/pii_libs.zip for --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.makedirs(f"{ROOT}/dist", exist_ok=True)
    out = f"{ROOT}/dist/pii_libs.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("pii_core", "pii_spark"):
            for dirpath, _dirs, files in os.walk(f"{ROOT}/{pkg}"):
                if "__pycache__" in dirpath:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
