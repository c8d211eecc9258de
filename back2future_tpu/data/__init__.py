"""Host data pipeline: manifests, sample loading, augmentation, prefetch."""

from .resample import resize

__all__ = ["resize"]
