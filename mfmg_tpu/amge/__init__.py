from mfmg_tpu.amge.agglomeration import build_agglomerates
from mfmg_tpu.amge.local_problems import AgglomerateBatch, build_agglomerate_batch
from mfmg_tpu.amge.restriction import build_restriction
from mfmg_tpu.amge.hierarchy import Hierarchy

__all__ = [
    "build_agglomerates",
    "AgglomerateBatch",
    "build_agglomerate_batch",
    "build_restriction",
    "Hierarchy",
]
