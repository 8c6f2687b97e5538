"""TPU-native practical path guiding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``takkasila/practical_path_guiding_lab`` (Mitsuba 3 + Dr.Jit, CUDA):
a guided unidirectional wavefront path tracer with an adaptive SD-tree
(spatial binary tree whose leaves own directional quadtrees), trained with
geometrically doubling sample budgets, per Mueller, Gross, Novak,
"Practical Path Guiding for Efficient Light-Transport Simulation" (2017).

Architecture (TPU-first, not a translation):
  core/      counter-based RNG, sphere<->canonical mapping, SoA pytree records
  io/        EXR (incl. native PIZ decode), Radiance HDR, PNG, OBJ, .serialized
  scene/     Mitsuba-XML parser -> frozen SceneArrays (device)
  bsdf/      vectorized branchless BSDF families with lobe flags
  accel/     host BVH/cluster builder + jnp & Pallas wavefront traversal
  guiding/   fixed-capacity SD-tree arrays: splat (segment-sum), refine, sample/pdf
  render/    wavefront integrators (unguided NEE PT + guided), film, variance
  parallel/  shard_map pixel-tile sharding, psum film/tree reductions
  drivers/   training / baseline / repeat drivers (reference main.py semantics)
  analysis/  performance CSV plots + SD-tree heat maps
  utils/     file naming, perf CSV records, console
"""

__version__ = "0.1.0"


def load_scene(path, **overrides):
    """Parse + compile a Mitsuba XML scene (mi.load_file equivalent)."""
    from .scene.scene import load_scene as _ls

    return _ls(path, **overrides)


def __getattr__(name):
    # lazy top-level conveniences without import-time jax cost
    if name == "PathGuidingIntegrator":
        from .render.integrator import PathGuidingIntegrator

        return PathGuidingIntegrator
    if name == "PathTracingIntegrator":
        from .render.integrator import PathTracingIntegrator

        return PathTracingIntegrator
    if name == "SDTree":
        from .guiding.sdtree import SDTree

        return SDTree
    raise AttributeError(name)

# Persistent compilation cache: first-compile of the fused render passes is
# expensive on remote-compile TPU backends; cache across processes/rounds.
import os as _os

from . import knobs

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        _cache = knobs.get("PPG_TPU_JIT_CACHE")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
