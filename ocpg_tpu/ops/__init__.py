from .ms_deform_attn import ms_deform_attn, ms_deform_attn_reference  # noqa: F401
from .image import (  # noqa: F401
    bilinear_resize,
    bicubic_resize,
    nearest_resize,
    pixel_shuffle,
    interpolate_like_torch,
)
