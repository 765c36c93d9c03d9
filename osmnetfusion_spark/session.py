"""SparkSession factory tuned for the engine.

Arrow on (all custom kernels are pandas/Arrow UDFs), AQE on with skew-join
handling (urban-core H3 cells are heavy hitters at web scale), small-file
coalescing on. ``shuffle_partitions`` defaults to the core count so local
runs do not pay 200-partition scheduling overhead; on a real cluster this
is set to ~2-3x total cores via ``--conf`` at spark-submit time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _mem_total_gib() -> int:
    """Machine memory in GiB (0 if unreadable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) // (1024 * 1024)
    except OSError:
        pass
    return 0


def _default_offheap_gb() -> int:
    """Off-heap default scaled to the host: min(48g, ~40% of MemTotal).

    Hardcoding 48g fails at startup on smaller hosts; scaling degrades
    gracefully while keeping the measured-optimal size on this 125 GiB box.
    """
    total = _mem_total_gib()
    if total <= 0:
        return 8
    return max(1, min(48, int(total * 0.4)))


def _default_local_dir() -> str:
    """tmpfs-backed shuffle dirs only when /dev/shm is actually large.

    RAM-backed local dirs keep shuffle IO off the VM's slow block storage,
    but on a host with a small /dev/shm they exhaust it mid-job -- fall
    back to disk below 16 GiB of tmpfs.
    """
    shm = "/dev/shm"
    if os.path.isdir(shm):
        try:
            st = os.statvfs(shm)
            if st.f_frsize * st.f_blocks >= 16 * 1024**3:
                return f"{shm}/spark-local"
        except OSError:
            pass
    return "/tmp"


def get_session(
    app_name: str = "osmnetfusion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the bench harness can pin parallelism for the N-vs-4N scaling runs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # deterministic outputs: no speculative partial commits
        .config("spark.speculation", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # keep broadcast threshold generous: dim tables (ranks, clusters,
        # tile metadata) are tiny relative to the pages fact table
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # prefer shuffled-hash over sort-merge when the per-partition build
        # side fits (guide §3.1/§9): the dedup/text equi-joins shuffle a few
        # MB per partition and the SMJ sort dominated their runtime
        # (measured: jaccard candidate join 7.5 s -> 2.5-3.4 s at 50k docs).
        # The AQE threshold bounds the runtime rewrite, so an oversized
        # build side still falls back to sort-merge instead of OOMing.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m"
        )
        # local mode: the driver heap IS the executor heap. Measured on this
        # box (32 threads, fat binary rows): G1 on a 48g heap spent ~45% of
        # stage runtime in GC (110s GC / 252s run in one shuffle stage);
        # ParallelGC on 16g runs the same job 7x faster (80.7s -> 11.6s).
        # Throughput GC + modest heap is the right default for batch
        # analytics; override via SPARK_GRAFT_DRIVER_MEM for huge collects.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # Tungsten sort/agg/join buffers off-heap: on-heap execution memory
        # fills old-gen with multi-GB arrays that every full GC rescans
        # (measured 549s GC in one 795s stage). Off-heap keeps the GC'd heap
        # small and the sort path allocation-free -- same flags a production
        # cluster would set per-executor.
        .config("spark.memory.offHeap.enabled", "true")
        .config(
            "spark.memory.offHeap.size",
            os.environ.get("SPARK_GRAFT_OFFHEAP", f"{_default_offheap_gb()}g"),
        )
        .config("spark.memory.fraction", "0.7")
        # shuffle spill on tmpfs: VM block storage does not scale with
        # cores; RAM-backed local dirs keep shuffle IO off the critical path
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", _default_local_dir()),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
