"""Internal exception types.

Parity reference: flygym ``utils/exceptions.py:4-7``.
"""

__all__ = ["FlyGymInternalError"]


class FlyGymInternalError(Exception):
    """Raised when an internal invariant of the framework is violated.

    If you see this, it is a bug in flygym-tpu itself rather than user error.
    """
