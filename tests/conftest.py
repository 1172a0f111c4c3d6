"""Shared fixtures: one small local SparkSession for the whole run.

Uses local[4] + 4 shuffle partitions — unit tests exercise semantics,
not scale; tools/check.py and bench.py cover the sf0.01/sf0.1 paths.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from openrouter_batch_processor_spark.session import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
