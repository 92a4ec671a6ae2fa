from .dense import intersect_rays, occluded_rays, visible
