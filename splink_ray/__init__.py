"""splink_ray — a Ray-Data-native probabilistic record-linkage engine.

From-scratch reimplementation of the query/data-processing capabilities of
``debiatan/splink`` (a fork of the public moj-analytical-services/splink
Fellegi-Sunter library), re-expressed as Ray Data pipelines over Arrow
batches. See SURVEY.md for the operator inventory and architecture.

Public API (mirrors splink 4's surface):

    from splink_ray import Linker, SettingsCreator, block_on, col
    import splink_ray.comparison_library as cl
    import splink_ray.comparison_level_library as cll
"""

def _tune_allocators() -> None:
    """Keep freed pages in-process instead of returning them to the OS.

    This environment has no transparent huge pages (``madvise``-only, zero
    AnonHugePages) and pathologically slow first-touch faults (~150 MB/s):
    every fresh large numpy/Arrow allocation cost more than the compute on
    it (measured 1.0 s → 0.02 s for a repeated 93 MB vector op once the
    buffer is reused). glibc mallopt stops numpy's big buffers being
    mmap/munmap-cycled; jemalloc decay −1 makes Arrow's pool retain pages.
    Purely process-local tuning — runs in every worker because Ray workers
    import this package when unpickling the pipeline functions."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    except Exception:
        pass
    try:
        import pyarrow as _pa

        # 10 s decay: long enough to reuse pages across consecutive batch
        # tasks, short enough that idle workers return memory (decay -1
        # caused pressure with 32 retained worker pools)
        _pa.jemalloc_set_decay_ms(10_000)
    except Exception:
        pass
    # NOTE: pre-faulting worker pools at import (128 MB numpy + arrow per
    # process) was tried and REGRESSED cold predict ~15% — 32 workers
    # faulting 8 GB concurrently at startup contend worse than faulting
    # lazily inside the first tasks. Don't re-add.


_tune_allocators()

from .blocking_rule_library import BlockingRule, KeyFunctionRule, block_on
from .expressions import ColumnExpression, col
from .settings import Comparison, Settings, SettingsCreator

__all__ = [
    "BlockingRule",
    "ColumnExpression",
    "Comparison",
    "KeyFunctionRule",
    "Linker",
    "Settings",
    "SettingsCreator",
    "block_on",
    "col",
]


def __getattr__(name):
    if name == "Linker":
        from .linker import Linker

        return Linker
    raise AttributeError(name)
