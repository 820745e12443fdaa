"""qiskit.transpiler stub: Target placeholder."""


class Target:
    def __init__(self, *args, **kwargs):
        pass
