"""Build the spark-submit artifact: a zip of the package for
``spark-submit --py-files`` (the deployment path the north star names).

    python package.py          # -> dist/mklab_focused_crawler_spark.zip
    spark-submit --master local[8] \
        --py-files dist/mklab_focused_crawler_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

PKG = "mklab_focused_crawler_spark"


def build(out_dir: str = "dist") -> str:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, p)
    return out


if __name__ == "__main__":
    print(build())
