"""thr3ed_atom_tpu — a TPU-native JAX re-design of the thre3d_atom radiance-field framework.

A dense SH-feature voxel grid is optimized from posed RGB images via differentiable
volumetric ray-marching, compiled end-to-end by XLA with a fused Pallas kernel on the
hot path and mesh-sharded data parallelism for multi-chip scaling.

Capability parity target: akanimax/thr3ed_atom (ReLU Fields, SIGGRAPH 2022 + 3inFusion).
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a TPU PJRT plugin is registered: with some plugins the
# env var alone is silently ignored; the config update (applied before the backend is
# first used) is authoritative. No-op when the env var is unset or jax is already live.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent compilation cache: TPU AOT compiles of the large fused train/render
# programs take minutes; cache them across processes. NOT enabled for forced-CPU
# runs (tests): XLA:CPU cache entries embed host-CPU features, and loading an
# entry AOT-compiled on a different host (deployment machines change between
# sessions) can SIGILL/segfault the process. CPU compiles are fast anyway.
if _os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
