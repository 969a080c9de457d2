from .batching import device_batch, stack_batches
from .synthetic import make_query_batch

__all__ = [
    "device_batch",
    "stack_batches",
    "make_query_batch",
    "build_dataset",
]


def build_dataset(*args, **kwargs):
    from .factory import build_dataset as _build

    return _build(*args, **kwargs)
