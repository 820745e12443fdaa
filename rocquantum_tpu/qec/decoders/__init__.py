from .repetition_decoder import RepetitionCodeDecoder  # noqa: F401
