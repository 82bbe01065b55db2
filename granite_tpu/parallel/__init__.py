from .framebuffer_sharding import make_tile_mesh, shard_frame_step
from .sharded_raster import band_cull_setup, rasterize_binned_sharded
