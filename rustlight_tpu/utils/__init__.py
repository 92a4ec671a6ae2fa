from .vec import (
    dot, cross, normalize, length, length2, luminance, channel_max,
    reflect_local, safe_sqrt, face_forward,
)
from .frame import make_frame, to_world, to_local
from . import warps
from .distribution import (
    Distribution1D, build_distribution_1d, sample_discrete_1d,
    sample_continuous_1d, pdf_discrete_1d,
    Distribution2D, build_distribution_2d, sample_continuous_2d, pdf_2d,
)
from .rng import RngStream, make_stream, stream_next, stream_next2d
