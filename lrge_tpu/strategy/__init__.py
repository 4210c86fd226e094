from .ava import AvaStrategy, AvaBuilder, DEFAULT_AVA_NUM_READS
from .twoset import (
    TwoSetStrategy,
    TwoSetBuilder,
    DEFAULT_TARGET_NUM_READS,
    DEFAULT_QUERY_NUM_READS,
)

__all__ = [
    "AvaStrategy",
    "AvaBuilder",
    "DEFAULT_AVA_NUM_READS",
    "TwoSetStrategy",
    "TwoSetBuilder",
    "DEFAULT_TARGET_NUM_READS",
    "DEFAULT_QUERY_NUM_READS",
]
