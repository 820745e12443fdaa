"""qiskit.result stub: Result.from_dict + get_counts."""


class Result:
    def __init__(self, d):
        self._d = d

    @classmethod
    def from_dict(cls, d):
        return cls(d)

    def get_counts(self, experiment=None):
        results = self._d.get("results", [])
        if not results:
            return {}
        idx = experiment if isinstance(experiment, int) else 0
        return dict(results[idx]["data"]["counts"])

    @property
    def success(self):
        return self._d.get("success", False)
