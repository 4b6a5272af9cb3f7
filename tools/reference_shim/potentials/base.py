"""The slice of davidnabergoj/potentials the reference front door touches:
``isinstance(target, Potential)`` + ``target.event_shape`` + callable
(``/root/reference/nfmc/sample.py:17,285-287``)."""
import torch


class Potential:
    def __init__(self, event_shape):
        if isinstance(event_shape, int):
            event_shape = (event_shape,)
        self.event_shape = torch.Size(tuple(int(s) for s in event_shape))

    def compute(self, x: torch.Tensor) -> torch.Tensor:
        raise NotImplementedError

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        return self.compute(x)

    def sample(self, batch_shape) -> torch.Tensor:
        raise NotImplementedError
