"""Micro-benchmark behind BENCH/BASELINE.md's environment claim: this
sandbox's JVM<->Python Arrow socket path anti-scales beyond ~8 concurrent
UDF workers per host, while raw CPU scales to 32 processes.

Two measurements over the SAME numpy kernel:

  1. raw multiprocessing — N python processes, no Spark, no sockets;
  2. a Spark pandas-UDF map at local[N] — identical math, but every batch
     crosses the executor<->worker Arrow socket.

If (1) scales and (2) collapses past ~8 workers, the ceiling is the socket
path, not the hardware or the plan — which is why the scaling evidence
pins per-host worker counts inside the well-behaved regime and scales
executor JVMs instead.

Usage: python BENCH/socket_ceiling.py  (takes ~3-4 min)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 2_000_000


def _kernel_rows(n: int) -> float:
    s = 0.0
    for v in range(n):
        x = np.arange(1, 20_000, dtype=np.float64)
        s += float(np.sqrt(x * (v % 97 + 1)).sum())
    return s


def raw_mp(nproc: int, total: int = ROWS // 10) -> float:
    t0 = time.time()
    with mp.Pool(nproc) as p:
        p.map(_kernel_rows, [total // nproc] * nproc)
    return time.time() - t0


def spark_udf(cores: int, total: int = ROWS) -> float:
    import subprocess
    import textwrap

    # fresh JVM per measurement so worker pools don't carry over
    code = textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from image_deduplication_3m_images_spark.session import get_spark, warm_python_workers
        from pyspark.sql import functions as F
        spark = get_spark(cores={cores}, app_name="socket_ceiling")
        spark.sparkContext.setLogLevel("ERROR")
        warm_python_workers(spark, {cores})
        @F.pandas_udf("double")
        def heavy(s):
            import numpy as np, pandas as pd
            out = []
            for v in s:
                x = np.arange(1, 20000, dtype=np.float64)
                out.append(float(np.sqrt(x * (v % 97 + 1)).sum()))
            return pd.Series(out)
        df = spark.range({total}, numPartitions={cores} * 8).select(heavy("id").alias("x"))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        print("WALL", time.time() - t0)
        spark.stop()
    """)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("WALL")][-1]
    return float(line.split()[1])


def spark_udf_wide(cores: int, total: int = 400_000) -> float:
    """Same shape as the signatures stage: ~3 KB of text per row crosses the
    Arrow socket into the worker and a digest comes back — byte-heavy, not
    compute-heavy.  This is the variant that exposes the socket ceiling."""
    import subprocess
    import textwrap

    code = textwrap.dedent(f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from image_deduplication_3m_images_spark.session import get_spark, warm_python_workers
        from pyspark.sql import functions as F
        spark = get_spark(cores={cores}, app_name="socket_ceiling_wide")
        spark.sparkContext.setLogLevel("ERROR")
        warm_python_workers(spark, {cores})
        @F.pandas_udf("long")
        def digest(s):
            import hashlib, pandas as pd
            return pd.Series([int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big") for t in s])
        df = (spark.range({total}, numPartitions={cores} * 8)
              .withColumn("t", F.concat(F.lit("x" * 3000), F.col("id").cast("string")))
              .select(digest("t").alias("d")))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        print("WALL", time.time() - t0)
        spark.stop()
    """)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("WALL")][-1]
    return float(line.split()[1])


def main() -> None:
    result = {
        "raw_multiprocessing": {},
        "spark_pandas_udf_single_jvm": {},
        "spark_pandas_udf_wide_payload": {},
    }
    for n in (4, 8, 16, 32):
        result["raw_multiprocessing"][n] = round(raw_mp(n), 2)
    for n in (4, 8, 16, 32):
        result["spark_pandas_udf_single_jvm"][n] = round(spark_udf(n), 2)
    for n in (4, 8, 16, 32):
        result["spark_pandas_udf_wide_payload"][n] = round(spark_udf_wide(n), 2)
    raw = result["raw_multiprocessing"]
    udf = result["spark_pandas_udf_single_jvm"]
    wide = result["spark_pandas_udf_wide_payload"]
    result["raw_eff_8_to_32"] = round((raw[8] / raw[32]) / 4, 3)
    result["udf_eff_8_to_32"] = round((udf[8] / udf[32]) / 4, 3)
    result["wide_eff_8_to_32"] = round((wide[8] / wide[32]) / 4, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
