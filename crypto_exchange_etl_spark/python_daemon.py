"""PySpark worker daemon with heavy imports preloaded before fork.

Python workers are forked from the pyspark daemon per executor thread.
By default each fresh worker imports pandas/numpy/pyarrow on first use —
measured here at ~0.5 s CPU per worker, which serializes into a 15-20 s
stall when a 32-thread executor spins up its worker pool for the first
pandas-UDF stage (and again whenever idle workers are reaped).

Importing those modules in the DAEMON process instead means every forked
worker inherits them via copy-on-write — worker spawn becomes ~free.

Activated by ``spark.python.daemon.module=crypto_exchange_etl_spark.python_daemon``
(set in session.get_spark). The daemon process must be able to import
this package, so session.py also forwards PYTHONPATH to workers.
"""

# Preload BEFORE pyspark.daemon forks workers (order: cheap→heavy).
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded half of arrow<->pandas)

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
