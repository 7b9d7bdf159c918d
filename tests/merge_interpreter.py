"""Compatibility shim: the KeyedMerge clause interpreter was promoted
into the library (mack_spark/merge_exec.py) when DeltaProtocolTable
made it an execution engine, not just a test oracle."""

from mack_spark.merge_exec import interpret_keyed_merge  # noqa: F401
