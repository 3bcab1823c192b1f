"""Fixed-shape feature ops: FAST detection, ORB/SIFT description, 2-NN
matching.  jnp reference implementations live here; Pallas fast paths in
``ops.pallas_kernels`` override them on TPU."""

from . import fast, image, knn, orb, sift

__all__ = ["fast", "image", "knn", "orb", "sift"]
