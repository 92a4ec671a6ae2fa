from .render import (adaptive_step_sharded, make_device_mesh,
                     render_block_sharded, render_sharded,
                     render_splat_sharded, render_step_sharded,
                     render_variance_sharded, splat_step_sharded)
