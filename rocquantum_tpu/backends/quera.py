"""QuEra backend client (skeleton, as in the reference
rocquantum/backends/quera.py — registered but not yet implemented)."""

from .base import RocqBackend


class QuEraBackend(RocqBackend):
    """Skeleton backend: accepted by set_target; job methods raise."""

    def __init__(self, backend_name: str = "quera", api_endpoint: str = ""):
        super().__init__(backend_name=backend_name, api_endpoint=api_endpoint)

    def authenticate(self) -> None:
        pass

    def _get_auth_headers(self):
        return {}

    def _build_payload(self, circuit_representation, shots):
        raise NotImplementedError(
            "The quera backend is a skeleton; job submission is not yet "
            "implemented.")
