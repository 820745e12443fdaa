from .repetition_code import ThreeQubitRepetitionCode  # noqa: F401
