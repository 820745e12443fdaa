"""pennylane.devices stub: the QubitDevice base surface RocQDevice uses."""

import numpy as _np


class QubitDevice:
    def __init__(self, wires, shots=None, **kwargs):
        if isinstance(wires, int):
            wires = list(range(wires))
        self.wires = list(wires)
        self.wire_map = {w: i for i, w in enumerate(self.wires)}
        self.shots = shots

    # PennyLane convention: wire 0 is the MOST significant bit of the
    # computational-basis index.
    def marginal_prob(self, probs, wires_to_trace):
        n = len(self.wires)
        t = _np.asarray(probs).reshape((2,) * n)
        if wires_to_trace:
            t = t.sum(axis=tuple(wires_to_trace))
        return t.reshape(-1)

    def states_to_binary(self, samples, num_wires):
        samples = _np.asarray(samples)
        shifts = _np.arange(num_wires - 1, -1, -1)
        return ((samples[:, None] >> shifts) & 1).astype(_np.int64)
