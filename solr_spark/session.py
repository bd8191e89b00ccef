"""SparkSession factory with scale-oriented defaults.

Tuned for correctness tests on local[N] but with settings chosen to hold on a
multi-executor cluster: AQE on (runtime coalescing + skew-join splitting),
Arrow enabled for every pandas-UDF boundary, and a shuffle-partition count
that AQE can shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "solr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback local[*]).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SOLR_SPARK_SHUFFLE_PARTITIONS", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, join demotion.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / toPandas boundaries (the analysis chain and
        # segment codecs live behind these).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Broadcast small dimension tables aggressively (term-stats tables,
        # query-term lists are tiny).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Stable timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SOLR_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local"):
        # In local mode every task is process-local, so the scheduler's
        # locality wait (default 3s tiers) only ever ADDS latency — measured
        # ~200 ms of constant per-job cost on some sandbox hosts. On a real
        # cluster master (yarn/k8s/standalone) the default stays: there the
        # wait trades latency for avoiding remote reads, which is the right
        # call for a 100 TB scan. (extra_conf below can still override.)
        b = b.config("spark.locality.wait", "0ms")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Reading a glob path (seg/*/*/postings.parquet) makes FileStreamSink
    # probe the literal glob string for streaming metadata and log a benign
    # WARN with a full FileNotFoundException stack trace. Silence that one
    # logger so benchmark/driver stderr carries only real signal.
    try:
        jvm = spark.sparkContext._jvm
        logger = jvm.org.apache.logging.log4j.LogManager.getLogger(
            "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink"
        )
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            logger.getName(), jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:
        pass  # non-log4j2 deployments: the WARN is cosmetic
    return spark


def gateway_key() -> int | None:
    """Identity of the live py4j gateway, for keying process-wide caches of
    Column objects. A classic-mode Column wraps a JavaObject bound to the
    gateway JVM; if that JVM is ever relaunched (driver crash recovery,
    explicit gateway teardown), cached Columns turn into stale references
    that fail with opaque Py4JErrors — keying the cache on the gateway
    instance makes a relaunch start a fresh cache generation instead.
    Returns None under Spark Connect (plan-only Columns, nothing to guard).
    """
    from pyspark import SparkContext

    gw = getattr(SparkContext, "_gateway", None)
    return id(gw) if gw is not None else None
