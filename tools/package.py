"""Build searchengine_spark.zip for spark-submit --py-files.

    python tools/package.py [out.zip]

Zips the package (source only, no __pycache__/pyc) with paths rooted so
``import searchengine_spark`` works on every executor:

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/build_index.py --pages ... --root ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "searchengine_spark"


def build_zip(out_path: str, repo_root: str | None = None) -> list[str]:
    """Write the --py-files zip; returns the archived file names."""
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    names: list[str] = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                arc = os.path.relpath(full, root)
                zf.write(full, arc)
                names.append(arc)
    return names


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    names = build_zip(out)
    print(f"{out}: {len(names)} files")


if __name__ == "__main__":
    main()
