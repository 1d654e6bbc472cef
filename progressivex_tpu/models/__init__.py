"""Model families (the geometric "models" of the framework).

Each family mirrors one reference estimator typedef (SURVEY.md §2.2) but is
implemented as batched closed-form XLA math rather than per-point virtual
calls.
"""

from progressivex_tpu.models.base import ModelFamily, get_family, register_family
from progressivex_tpu.models.line2d import LINE2D
from progressivex_tpu.models.vanishing_point import VANISHING_POINT
from progressivex_tpu.models.homography import HOMOGRAPHY
from progressivex_tpu.models.fundamental import FUNDAMENTAL
from progressivex_tpu.models.pnp import PNP
from progressivex_tpu.models.essential import ESSENTIAL

__all__ = [
    "ModelFamily",
    "get_family",
    "register_family",
    "ESSENTIAL",
    "LINE2D",
    "VANISHING_POINT",
    "HOMOGRAPHY",
    "FUNDAMENTAL",
    "PNP",
]
