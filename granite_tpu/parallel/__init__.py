from .framebuffer_sharding import make_tile_mesh, shard_frame_step
