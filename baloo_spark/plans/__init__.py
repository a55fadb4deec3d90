"""Physical-plan shaping utilities (ordinal, skew, bucketing) and
scale diagnostics."""

import warnings


class ScaleWarning(UserWarning):
    """An operation was invoked in a shape that collapses to a single
    partition (or otherwise won't scale) — correct on test data,
    a bottleneck on a real cluster."""


def warn_single_partition(what: str, alternative: str):
    """Runtime counterpart of the docstring scale notes: global
    windows / no-key as-of joins run correct-but-serial, so say so
    loudly instead of only in documentation."""
    warnings.warn(
        f"{what} runs on a SINGLE partition — fine for small data, a "
        f"serial bottleneck at scale. {alternative}",
        ScaleWarning, stacklevel=3)
