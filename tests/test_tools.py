"""Unit contracts of the repo tools (no Spark session needed)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_heap_gb_parses_spark_memory_spellings():
    """The heap fail-fast must read memory specs the way Spark does:
    suffixless spark.driver.memory is MiB (not bytes), two-letter
    suffixes are valid, and an unparseable spec returns None so the
    guard skips rather than exiting spuriously."""
    from scale_probe import _heap_gb

    assert _heap_gb("48g") == 48.0
    assert _heap_gb("48G") == 48.0
    assert _heap_gb("2gb") == 2.0
    assert _heap_gb("8192m") == 8.0
    assert _heap_gb("8192") == 8.0      # bare number = MiB, Spark semantics
    assert _heap_gb("1048576k") == 1.0
    assert _heap_gb("1t") == 1024.0
    assert _heap_gb("oops") is None
    assert _heap_gb("") is None
