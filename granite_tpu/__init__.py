"""granite_tpu — a TPU-native rendering engine.

A from-scratch JAX/XLA/Pallas engine with the capabilities of Themaister/Granite
(the C++/Vulkan reference lives at /root/reference and is cited throughout the
docstrings as `file:line`).  The render-graph frame loop is a traced, jitted XLA
program; GLSL shaders become Pallas kernels / jnp functions; Vulkan command &
descriptor machinery becomes pure-functional frame state.

Layer map (mirrors reference CMakeLists.txt:215-236):
  utils/   -> util/ + path/      (logging, tracing, hashing, timers, config)
  math/    -> math/ (muglm)      (same conventions: column-major semantics,
                                  RH -Z view space, Vulkan clip, reverse-Z)
  core/    -> vulkan/context+device  (Backend, FrameContext ring, stats)
  graph/   -> renderer/render_graph  (declarative pass DAG -> jitted frame fn)
  ops/     -> assets/shaders/    (the kernel library: raster, shading, post)
  scene/   -> renderer/{scene,formats}, ecs/  (ECS, nodes, glTF, animation)
  assets/  -> filesystem/        (VFS, asset manager, textures)
  renderer/-> renderer/          (renderer suite, lights, post orchestration)
  app/     -> application/       (headless platform, viewer, event loop)
  parallel/-> (new)              (mesh/sharding for multi-chip framebuffers)
"""

__version__ = "0.1.0"
