from . import gates, statevec  # noqa: F401
