from .loader import TextSampler

__all__ = ["TextSampler"]
