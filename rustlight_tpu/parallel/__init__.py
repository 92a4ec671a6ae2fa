from .render import (make_device_mesh, render_block_sharded, render_sharded,
                     render_splat_sharded, render_step_sharded,
                     splat_step_sharded)
