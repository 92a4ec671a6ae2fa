from .camera import (Camera, make_camera, resize_camera, look_at,
                     generate_rays, sample_direct)
from .geometry import (
    TriMesh, GeometryTables, build_geometry_tables, make_quad, make_box,
    make_sphere, scene_bounds,
)
from .emitters import (
    EmitterTables, LightSample, PositionSample, build_emitter_tables,
    sample_light, direct_pdf_tri, emitted_radiance, env_radiance,
    env_direction_pdf, sample_position, sample_emission_direction,
)
from .volume import (
    HomogeneousVolume, make_volume, phase_eval, phase_pdf, phase_sample,
    volume_sample_distance, transmittance, distance_pdf, SampledDistance,
)
from .scene import Scene, SceneData, Hit, fill_hit
