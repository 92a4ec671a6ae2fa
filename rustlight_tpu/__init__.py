"""rustlight_tpu — a TPU-native physically-based light-transport renderer.

A from-scratch rebuild of the capabilities of the `rustlight` research renderer
(beltegeuse/rustlight) designed for TPUs: wavefront (bounce-synchronous) Monte
Carlo integrators over SoA path-state arrays, MXU-friendly ray/triangle
intersection, branch-free masked BSDF/emitter kernels, counter-based RNG, and
`jax.sharding`-based multi-chip scaling.

Layout (mirrors the reference's layer map, SURVEY.md §1):
  utils/       math primitives: frames, warps, distributions, solvers, images
  ops/         compute kernels: ray-triangle intersection, BVH traversal (Pallas)
  scene/       scene model: meshes, camera, emitters, volumes, loaders
  bsdfs/       material archetypes as masked kernels dispatched by material id
  accel/       acceleration structures: dense MXU intersector, flattened BVH
  samplers/    RNG streams: independent, stratified, primary-sample-space (MCMC)
  integrators/ ao/direct/path/light/vpl/... wavefront integrators + MCMC + gradient
  parallel/    device-mesh sharding of the render loop, film reductions
  models/      ready-made scenes (Cornell box & friends) and render presets
"""

__version__ = "0.1.0"

EPSILON = 1e-4  # ray epsilon, mirrors reference src/lib.rs:50-53
ONE_MINUS_EPSILON = 1.0 - 1e-7
