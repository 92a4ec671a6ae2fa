from .table import (
    MaterialDesc, MaterialTable, build_material_table,
    diffuse, phong, glass, metal, substrate, blend,
    KIND_DIFFUSE, KIND_PHONG, KIND_GLASS, KIND_METAL, KIND_SUBSTRATE, KIND_BLEND,
    TEX_CONST, TEX_BITMAP, TEX_CHECKER, TEX_GRID,
    TRANSPORT_IMPORTANCE, TRANSPORT_RADIANCE,
)
from .kernels import (
    BsdfSample, bsdf_eval, bsdf_pdf, bsdf_sample, bsdf_is_smooth,
    bsdf_two_sided, diffuse_color,
)
from .fresnel import fresnel_dielectric, fresnel_conductor, schlick_fresnel
