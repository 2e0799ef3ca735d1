"""spark-submit driver script for the QC pipeline (north_rule launch mode).

    spark-submit --master <cluster> --py-files longqc_spark.zip \
        tools/submit_qc.py --input /path/documents_parquet --out /path/qc_out \
        [--buckets 4096] [--preset default|driver_docs] [--report]

The package ships to executors via ``--py-files``; this file is only the
driver entry (spark-submit takes a script, not ``-m module``). Build the zip
with::

    (cd /root/repo && python -c "import shutil; \
        shutil.make_archive('longqc_spark', 'zip', '.', 'longqc_spark')")
"""

import sys

from longqc_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
