from .interp import bilinear_sample, bilinear_sample_views
from .knn import knn, knn_gather, knn_rays

__all__ = ["bilinear_sample", "bilinear_sample_views", "knn", "knn_gather", "knn_rays"]
