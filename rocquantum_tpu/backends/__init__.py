from .base import (  # noqa: F401
    RocqBackend,
    BackendAuthenticationError,
    JobSubmissionError,
    ResultRetrievalError,
)
