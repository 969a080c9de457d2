from .netvlad import NetVLAD
from .pipeline import (
    evaluate_retrieval,
    retrieve_top_k,
    retrieve_top_k_oracle,
)

__all__ = [
    "NetVLAD",
    "retrieve_top_k",
    "retrieve_top_k_oracle",
    "evaluate_retrieval",
    "get_retrieval_model",
    "register_retrieval_model",
]

# plugin registry (the reference's BaseModel + dynamic_load pattern,
# nerf_loc/models/image_retrieval/base_model.py:8-47): methods register a
# descriptor-extractor factory by name; 'oracle' is handled by the pipeline
# without a model.
_REGISTRY = {}


def register_retrieval_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_retrieval_model(name: str):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown retrieval method {name!r}; known: "
            f"{sorted(_REGISTRY) + ['oracle']}")
    return _REGISTRY[name]()


@register_retrieval_model("netvlad")
def _netvlad():
    return NetVLAD()


@register_retrieval_model("dir")
def _dir():
    # GeM-pooled descriptor (the reference's AP-GeM/DIR wrapper equivalent)
    from .gem import GeMDescriptor

    return GeMDescriptor()
