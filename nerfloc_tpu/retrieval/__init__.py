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
]
