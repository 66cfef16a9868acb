"""spark-submit driver script (the file ``spark-submit`` runs).

    python package.py
    spark-submit --master <cluster> \
        --py-files dist/mklab_focused_crawler_spark.zip \
        crawl_job.py crawl --root /data/crawl \
        --synthetic-pages 2000000 --hosts 100000 --iterations 4

All logic lives in ``mklab_focused_crawler_spark.cli`` so the same
argv works via bare ``python -m mklab_focused_crawler_spark.cli``.
"""

import sys

from mklab_focused_crawler_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
