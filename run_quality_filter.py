"""spark-submit driver script for the web-text quality-filter pipeline.

    python tools/package.py
    spark-submit --py-files dist/data_quality_spark.zip \
        run_quality_filter.py --input <pages parquet> --out <dir> [--buckets 64]

On a cluster, omit --master (spark-submit decides); locally the session
factory falls back to local[$SPARK_GRAFT_CPUS]. Resumable: re-running with
the same --out skips buckets recorded in the manifest (snapshot-checkpoint
emulation — see pipeline/quality_filter.py).
"""

from data_quality_spark.pipeline.quality_filter import main

if __name__ == "__main__":
    main()
