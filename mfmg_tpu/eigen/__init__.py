from mfmg_tpu.eigen.batched_eigh import batched_smallest_eigenpairs

__all__ = ["batched_smallest_eigenpairs"]
