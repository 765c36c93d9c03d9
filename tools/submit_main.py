"""spark-submit entry script.

spark-submit takes a script file (not ``-m module``), so this thin wrapper
is the file you pass; the package itself ships via ``--py-files``:

    python tools/make_pyfiles_zip.py                  # -> /tmp/onf_spark.zip
    spark-submit --master local[8] \\
        --py-files /tmp/onf_spark.zip \\
        tools/submit_main.py pipeline --scale 1 \\
        --warehouse /tmp/onf_wh --resume

On a real cluster swap ``--master`` for the cluster manager and set
``--conf spark.sql.shuffle.partitions=<2-3x total cores>``; nothing else
changes -- the engine never assumes local mode.
"""

from osmnetfusion_spark.cli import main

if __name__ == "__main__":
    main()
