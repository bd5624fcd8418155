"""bigmatch_utilities_spark — a PySpark-native record-linkage engine.

A from-scratch reimplementation of the *capabilities* of
ofergold/bigmatch_utilities (GUI/shell tooling around the US Census
BigMatch batch record-linkage engine): multi-pass blocking, Fellegi–Sunter
probabilistic pairwise scoring with m/u agreement weights, cutoff-driven
match/possible splits, and transitive clustering of accepted pairs —
re-expressed as declarative DataFrame plans so Catalyst/Tungsten pick the
physical strategy.

Nothing here is a port: the reference drives an external C engine through
``parmf.txt`` parameter files (see ``/root/reference/README.md``); this
package re-expresses those semantics Spark-first.
"""

from bigmatch_utilities_spark.config import (
    BlockField,
    BlockingPassSpec,
    CutoffSpec,
    MatchConfig,
    MatchField,
    parse_parmf,
    parse_parmn,
    write_parmf,
)

__all__ = [
    "BlockField",
    "BlockingPassSpec",
    "CutoffSpec",
    "MatchConfig",
    "MatchField",
    "parse_parmf",
    "parse_parmn",
    "write_parmf",
]

__version__ = "0.1.0"
