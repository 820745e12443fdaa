"""qiskit.providers stub: BackendV2 + Options (the surface BackendV2
subclasses in rocquantum_tpu.integrations.qiskit_provider rely on).
ProviderV1 is intentionally absent — the plugin falls back to a plain
registry, matching qiskit 1.x."""


class Options(dict):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.__dict__.update(kwargs)


class BackendV2:
    def __init__(self, provider=None, name=None, **kwargs):
        self._provider = provider
        self.name = name
        self._options = type(self)._default_options()

    @classmethod
    def _default_options(cls):
        return Options()

    @property
    def options(self):
        return self._options
