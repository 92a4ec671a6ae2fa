from .cbox import cornell_box
from .presets import simple_sphere_scene, furnace_scene
from .veach import veach_mis
